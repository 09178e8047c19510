package graft

import java.nio.file.Files
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, expr, lit, pmod, to_timestamp, when}
import org.scalatest.funsuite.AnyFunSuite

/** Twentieth totality sweep: hostile PARTITION VALUES. The nineteenth
  * sweep probed extreme order/ship dates through COMPUTATION; here the
  * extreme timestamps flow into a PARTITION COLUMN — SketchStore's
  * `day` is `date_format(ts, 'yyyy-MM-dd')` used as a physical
  * partitionBy key through dynamic partition overwrite, partition
  * pruning, and path round-trips. Partition-value handling is a
  * DISTINCT failure surface from computation: values become directory
  * names (escaping), get re-parsed by partition discovery (type
  * inference on weird strings), equi-join back against computed values
  * (the touched-days semi join), and must survive overwrite-by-
  * partition without clobbering neighbors. The classes:
  *   - NULL ts → the '__null__' sentinel day (the r13 state-loss fix);
  *   - epoch 0 (maximal ties on one day);
  *   - far future inside the 4-digit band (~9024);
  *   - beyond the 4-digit band (~12024 — 5-digit year, whatever sign
  *     prefix the formatter emits becomes a directory name);
  *   - year ~0005 (leading zeros — a string a careless partition-type
  *     inference would read as the integer 5's date... or fail);
  *   - BCE (~77 BC: year-of-era formatting, era dropped — collides
  *     with the CE twin string by design; both engines of THIS sweep
  *     are the same code path, so the collision must merge cleanly).
  *
  * Green = for every class the absorbed store state equals the one-shot
  * direct compute (bit-for-bit, both sketch families), per-day reads
  * return exactly the computed day set, and every store-face registry
  * query is total on the fixture.
  */
class AdversarialPartitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Hostile remap keyed on event_id (pure function of the row). */
  private def remap(ts: Column, id: Column): Column = {
    val m = pmod(id, lit(6L))
    when(m === 0, ts)
      .when(m === 1, lit(null).cast("timestamp"))
      .when(m === 2, to_timestamp(lit("1970-01-01 00:00:00")))
      .when(m === 3, ts + expr("INTERVAL 7000 YEARS"))
      .when(m === 4, ts + expr("INTERVAL 10000 YEARS"))
      .otherwise(ts - expr("INTERVAL 2100 YEARS"))
  }

  private lazy val advDir: String = {
    val dir = Files.createTempDirectory("graft_advpart").toString
    Tables.names.foreach { t =>
      if (t == "events") {
        Tables.load(spark, "/root/testdata/sf0.001", t)
          .withColumn("ts", remap(col("ts"), col("event_id")))
          .coalesce(1).write.parquet(s"$dir/$t.parquet")
      } else {
        spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
          .coalesce(1).write.parquet(s"$dir/$t.parquet")
      }
    }
    dir
  }

  private def events = Tables.load(spark, advDir, "events")

  private def stateMap(dir: String)
      : Map[(String, String), (Seq[Long], Seq[Long])] =
    graft.operators.SketchStore.read(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getSeq[Long](2), r.getSeq[Long](3))).toMap

  test("hostile days survive batched dynamic-partition-overwrite absorb == one-shot build") {
    import graft.operators.SketchStore
    val dir = Files.createTempDirectory("graft_advpart_st").toString + "/state"
    val batches = (0 to 2).map(i => events.filter($"event_id" % 3 === i))
    batches.foreach(b => SketchStore.update(spark, dir, b))
    // replay batch 1 — idempotence must hold for hostile partitions too
    SketchStore.update(spark, dir, batches(1))
    val incremental = stateMap(dir)
    val oneShot = SketchStore.batchSketches(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getSeq[Long](2), r.getSeq[Long](3))).toMap
    assert(incremental == oneShot,
      "hostile-day state must round-trip the partitioned store bit-for-bit")
    // the hostile day strings actually materialized (fixture sanity):
    val days = incremental.keySet.map(_._1)
    assert(days.contains("__null__"), "NULL-ts sentinel day missing")
    assert(days.contains("1970-01-01"), "epoch day missing")
    assert(days.exists(_.matches("90\\d\\d-.*")), "far-future day missing")
    assert(days.exists(d => d.matches("\\D?1\\d{4}-.*")),
      s"5-digit-year day missing in ${days.toSeq.sorted.take(8)}")
  }

  test("per-day pruned reads return exactly the computed day set, hostile values included") {
    import graft.operators.SketchStore
    val dir = Files.createTempDirectory("graft_advpart_rd").toString + "/state"
    SketchStore.update(spark, dir, events)
    val expect = SketchStore.batchSketches(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getSeq[Long](2), r.getSeq[Long](3))).toMap
    val state = SketchStore.read(spark, dir)
    val days = expect.keySet.map(_._1)
    days.foreach { d =>
      val got = state.filter(col("day") === d).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getSeq[Long](2), r.getSeq[Long](3))).toMap
      val want = expect.filter(_._1._1 == d)
      assert(got == want, s"pruned read of day '$d' diverged")
    }
    // and the read-back day set is exactly the computed one (no
    // escaping artifact invented or lost a partition)
    assert(state.select("day").distinct().collect().map(_.getString(0)).toSet
      == days)
  }

  for (name <- Seq("q145_sketchstore_rollup", "q149_sketchstore_daily",
      "q150_sketchstore_setops", "q152_sketchstore_stream"))
    test(s"$name is total on hostile partition values") {
      SparkEntry.queries(name)(spark, advDir).collect() // must not throw
    }
}
