package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted sketch store's load-bearing properties:
  *   - incremental absorption == one-shot build (register state is a
  *     pure function of the absorbed row set, however it was batched);
  *   - replay idempotence FOR FREE (max-merge): re-absorbing a batch
  *     leaves the state bit-identical — no batch-id bookkeeping;
  *   - rollups from state == direct sketches over all rows (q142's
  *     equality, exploited against durable state);
  *   - an update rewrites ONLY the touched day partitions;
  *   - a single-day read prunes to that partition (physical plan).
  */
class SketchStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val srcDir = "/root/testdata/sf0.001/events.parquet"

  private def events = spark.read.parquet(srcDir)

  private def stateMap(dir: String): Map[(String, String), Seq[Long]] =
    SketchStore.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getSeq[Long](2)).toMap

  /** Partition-dir file listing (path -> length) for change detection. */
  private def listing(dir: String): Map[String, Long] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.length()).toMap
  }

  test("three incremental batches == one-shot build; replay is bit-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sks").toString + "/state"
    val batches = (0 to 2).map(i => events.filter($"event_id" % 3 === i))
    batches.foreach(b => SketchStore.update(spark, dir, b))
    val incremental = stateMap(dir)
    // one-shot reference over the same rows
    val oneShot = SketchStore.batchSketches(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getSeq[Long](2)).toMap
    assert(incremental == oneShot,
      "incrementally absorbed registers must equal the one-shot build")
    // at-least-once delivery: replaying batch 1 changes NOTHING
    SketchStore.update(spark, dir, batches(1))
    assert(stateMap(dir) == incremental, "replay must be value-idempotent")
  }

  test("rollups from state equal direct sketches over all rows") {
    import graft.functions.HllSketch
    val dir = java.nio.file.Files.createTempDirectory("graft_sksr").toString + "/state"
    (0 to 2).foreach(i =>
      SketchStore.update(spark, dir, events.filter($"event_id" % 3 === i)))
    val state = SketchStore.read(spark, dir)
    // per-scope rollup vs direct per-scope sketch over the raw rows
    val rolled = SketchStore.rollup(state, Seq("scope"))
      .select($"scope", $"regs").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = events
      .select(coalesce($"event_type", lit("__null__")).as("scope"),
        coalesce(HllSketch.hash60($"user_id".cast("string")), lit(-1L)).as("ph"))
      .groupBy($"scope").agg(HllSketch.hll($"ph").as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rolled == direct)
    // global rollup vs direct global sketch
    val g = SketchStore.rollup(state, Seq.empty).collect()(0)
    val gDirect = events
      .select(coalesce(HllSketch.hash60($"user_id".cast("string")), lit(-1L)).as("ph"))
      .agg(HllSketch.hll($"ph").as("regs")).collect()(0).getSeq[Long](0)
    assert(g.getSeq[Long](g.fieldIndex("regs")) == gDirect)
    // the estimator pair rides along (q140 convention)
    assert(!g.isNullAt(g.fieldIndex("est_users")))
    val zr = g.getLong(g.fieldIndex("zero_regs"))
    if (zr > 0) {
      val exp = math.floor(Math.log(256.0 / zr) * 256000000.0).toLong
      assert(g.getLong(g.fieldIndex("est_lc_micro")) == exp)
    }
  }

  test("an update rewrites only the touched day partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sksp").toString + "/state"
    SketchStore.update(spark, dir, events)
    val before = listing(dir)
    // a late batch for ONE day
    val oneDay = events
      .filter(date_format($"ts", "yyyy-MM-dd") === "2024-01-15")
      .limit(50)
    SketchStore.update(spark, dir, oneDay)
    val after = listing(dir)
    val changedDirs = (after.keySet -- before.keySet)
      .map(p => p.replaceAll("/[^/]*$", "")) // parent dirs of new files
    assert(changedDirs.forall(_.contains("day=2024-01-15")),
      s"untouched partitions rewritten: $changedDirs")
    val untouchedBefore = before.filterNot(_._1.contains("day=2024-01-15"))
    val untouchedAfter = after.filterNot(_._1.contains("day=2024-01-15"))
    assert(untouchedBefore == untouchedAfter,
      "files outside the touched day must be byte-identical (same paths, sizes)")
  }

  test("a single-day read prunes to that partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sksq").toString + "/state"
    SketchStore.update(spark, dir, events)
    val df = spark.read.parquet(dir).filter($"day" === "2024-01-15")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters:") && plan.contains("2024-01-15"),
      s"day filter not pushed to partition pruning:\n${plan.take(2000)}")
  }
}
