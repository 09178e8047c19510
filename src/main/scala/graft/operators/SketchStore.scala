package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted per-day sketch state — the durable-index MO (DedupIndex /
  * SpanIndex / CanonicalMap) applied to the sketch tier: one HLL
  * register array per (day, scope) kept as a DAY-PARTITIONED parquet
  * table, incrementally absorbed batch by batch, with every rollup
  * (per-scope, per-day, global) computed from O(days·scopes·m) bytes of
  * state and NO pass over historical rows. q142 proves
  * union-of-sketches == sketch-of-union under the oracle; this is the
  * production face that exploits it: at 100 TB the events history is
  * unreadably large, but the state table is a few megabytes and every
  * distinct-users dashboard question is a register fold.
  *
  * Update semantics make replay FREE: the stored array is an
  * element-wise MAX over everything absorbed, and max is idempotent —
  * re-absorbing a delivered-twice batch leaves the state bit-identical
  * (SketchStoreSpec pins it). That is why the state deliberately holds
  * ONLY registers: an exact row counter alongside them would double on
  * replay and need the batch-id bookkeeping DocStream carries; the
  * sketch alone is exactly-once for free under at-least-once delivery.
  *
  * Scale shape: an update touches ONLY the partitions of the days in
  * the batch (dynamic partition overwrite — untouched day directories
  * are not rewritten, spec-pinned by file listing), and a single-day
  * read prunes to that partition (spec-pinned from the physical plan's
  * PartitionFilters). Merge cost is O(batch days · scopes · m).
  */
object SketchStore {

  /** Per-(day, scope) HLL register arrays for an events frame — the
    * q140/q142 hash and sentinel conventions (md5 60-bit key hash;
    * NULL users skipped; NULL event types keep their own '__null__'
    * scope).
    */
  def batchSketches(events: DataFrame): DataFrame = {
    import graft.functions.HllSketch
    events
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        coalesce(col("event_type"), lit("__null__")).as("scope"),
        coalesce(HllSketch.hash60(col("user_id").cast("string")),
          lit(-1L)).as("ph"))
      .groupBy(col("day"), col("scope"))
      .agg(HllSketch.hll(col("ph")).as("regs"))
  }

  /** Absorb one events batch into the persisted state at `storeDir`:
    * read ONLY the touched days' existing registers (left-semi on the
    * batch's day set — no driver-side day list), fold old and new by
    * element-wise max, and dynamically overwrite just those day
    * partitions. Safe against the read-own-path overwrite hazard via
    * localCheckpoint (the q63 convention: checkpoint blocks are
    * ContextCleaner-tracked, unlike cache pins).
    */
  def update(spark: SparkSession, storeDir: String, events: DataFrame): Unit = {
    import graft.functions.HllSketch
    val batch = batchSketches(events)
    val merged =
      if (exists(spark, storeDir)) {
        val touched = read(spark, storeDir)
          .join(batch.select(col("day")).distinct(), Seq("day"), "left_semi")
        touched.unionByName(batch)
          .groupBy(col("day"), col("scope"))
          .agg(HllSketch.hllMerge(col("regs")).as("regs"))
      } else batch
    merged.localCheckpoint() // materialize before overwriting the source
      .write
      .partitionBy("day")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(storeDir)
  }

  def exists(spark: SparkSession, storeDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** The persisted state: (day, scope, regs). */
  def read(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir)
      .select(col("day").cast("string").as("day"), col("scope"), col("regs"))

  /** Roll the state up to `keys` (e.g. Seq("scope") for all-time
    * per-scope, Seq("day") for per-day all-scopes, Seq() for global):
    * one register fold over state rows, then the q140 estimator pair —
    * the raw HLL estimate plus the small-range linear-counting branch
    * (`zero_regs` / `est_lc_micro`), so a consumer always has the
    * applicable estimator.
    */
  def rollup(state: DataFrame, keys: Seq[String]): DataFrame = {
    import graft.functions.{HllSketch, MathLn}
    val grouped =
      if (keys.isEmpty)
        state.agg(HllSketch.hllMerge(col("regs")).as("regs"))
      else
        state.groupBy(keys.map(col): _*)
          .agg(HllSketch.hllMerge(col("regs")).as("regs"))
    val est = grouped
      .withColumn("hll_sum", expr(HllSketch.sumSql("regs")))
      .withColumn("zero_regs", expr(HllSketch.zerosSql("regs")).cast("long"))
      .withColumn("est_users", expr(HllSketch.estRawSql("hll_sum")))
      .withColumn("est_lc_micro",
        when(col("zero_regs") > 0,
          floor(MathLn.ln(lit(HllSketch.M.toDouble) /
            col("zero_regs").cast("double")) *
            lit(HllSketch.M * 1000000.0)).cast("long")))
      .drop("hll_sum")
    if (keys.isEmpty) est else est.orderBy(keys.map(col): _*)
  }
}
