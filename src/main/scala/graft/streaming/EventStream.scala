package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events stream (SURVEY.md §2.9: the
  * reference has no streaming — this is the extension surface, built the
  * only idiomatic way: `readStream` → watermarked event-time transforms →
  * sink; no legacy DStreams).
  *
  * The same transform functions run identically on batch DataFrames —
  * tested by feeding the batch events table through both paths and
  * comparing (the streaming-batch unification Spark gives for free when
  * logic is declarative).
  */
object EventStream {

  /** events schema as the stream source sees it (ts already µs; the
    * nanos→µs conversion happens in Tables.load for the batch path, and
    * upstream producers would emit µs).
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of parquet drops. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window per-type rollup with late-data watermark: the
    * streaming analogue of the reference's clickstream daily rollups.
    * Decimal-routed sum keeps the aggregate exact under any trigger
    * schedule.
    */
  def windowedCounts(events: DataFrame,
      window: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // exact distinct is unsupported on streams; HLL sketches merge
        // associatively so stream and batch agree bit-for-bit
        approx_count_distinct(col("user_id")).as("unique_users"),
        // graft.Cols.dec: range-guarded decimal route — a finite value
        // beyond DECIMAL(12,2) would THROW under ANSI mid-stream
        sum(graft.Cols.dec(col("value"))).cast("double")
          .as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("unique_users"),
        col("total_value"))

  /** Session windows per user (gap-based): Spark's native
    * session_window keyed state — the declarative form of
    * mapGroupsWithState sessionization.
    */
  def sessionize(events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(graft.Cols.dec(col("value"))).cast("double")
          .as("session_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  /** Timestamps kept as-is (not epoch millis): `getTime` would truncate
    * the µs component and desync emitted sessions from the event-time
    * values the windowed operators see.
    */
  final case class SessionState(start: java.sql.Timestamp,
      last: java.sql.Timestamp, n: Long, sum: Double)

  final case class UserSession(user_id: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      n_events: Long, total_value: Double)

  /** Custom stateful sessionization via `flatMapGroupsWithState` — the
    * escape hatch when session semantics exceed `session_window` (e.g.
    * value caps, per-user config). State per user is one open session;
    * events extend it while within `gapMs`, otherwise the closed
    * session is emitted and a new one opens. The final open session
    * closes on event-time timeout past the watermark.
    */
  def sessionizeStateful(events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          def toSession(s: SessionState) =
            UserSession(user, s.start, s.last, s.n, s.sum)
          if (it.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(toSession).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[UserSession]
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts.getTime - s.last.getTime <= gapMs =>
                  open = Some(s.copy(last = e.ts, n = s.n + 1,
                    sum = s.sum + e.value))
                case Some(s) =>
                  closed += toSession(s)
                  open = Some(SessionState(e.ts, e.ts, 1, e.value))
                case None =>
                  open = Some(SessionState(e.ts, e.ts, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** EW-baseline state per event type: open (unclosed) window counts
    * keyed by window-start epoch-ms, plus the exponentially-weighted
    * mean/variance of CLOSED window counts and how many have closed.
    */
  final case class RateState(open: Map[Long, Long],
      mean: Double, varr: Double, nClosed: Long)

  final case class RateAlert(event_type: String,
      window_start: java.sql.Timestamp, window_end: java.sql.Timestamp,
      n_events: Long, baseline_mean: Double, baseline_std: Double,
      z: Double, anomalous: Boolean)

  /** Streaming RATE-ANOMALY MONITOR — the DQ alarm a production ingest
    * runs beside the pipeline: per event type, score each closed
    * tumbling window's count against an exponentially-weighted
    * mean/variance baseline of the type's OWN history, and flag
    * |z| > `zThreshold` once `minBaseline` windows have closed (a
    * traffic cliff, a stuck producer, a replay storm — all show up as
    * a window count far from the EW baseline).
    *
    * One `flatMapGroupsWithState` owns BOTH the windowing and the
    * baseline: Spark disallows (flat)MapGroupsWithState downstream of
    * a streaming aggregation, so the window counts an agg would
    * produce are folded in-state instead (`open`: window-start →
    * count). A window closes when the event-time watermark passes its
    * end; closes happen in window order, so the EW fold's arithmetic
    * sequence per type is a pure function of the DATA — any trigger
    * schedule (one batch, file-at-a-time, a crash/restart replay)
    * emits bit-identical alerts, which is what EventStreamSpec pins.
    * The z-score uses the baseline BEFORE folding the window in
    * (prior-based), so an anomalous window is judged against history
    * that does not already contain it.
    *
    * State per type is O(open windows + 3 doubles) — bounded by the
    * watermark delay over the window size, independent of traffic.
    * At 100 TB/day the shuffle is one row per event into #types
    * groups; for very hot types the same fold runs on a salted
    * (type, shard) key with a tiny second-level merge, the q75 MO.
    */
  def rateMonitor(events: Dataset[Event],
      windowMs: Long = 3600L * 1000L,
      watermark: String = "10 minutes",
      alpha: Double = 0.25,
      zThreshold: Double = 3.0,
      minBaseline: Long = 3L): Dataset[RateAlert] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (typ: String, it: Iterator[Event], state: GroupState[RateState]) =>
          var s = state.getOption.getOrElse(RateState(Map.empty, 0.0, 0.0, 0L))
          // ingest this batch's events into open window buckets.
          // getTime truncates µs→ms, which cannot misassign: window
          // boundaries are whole seconds, and any µs remainder keeps
          // the event on the same side of them as its truncation.
          it.foreach { e =>
            val w = Math.floorDiv(e.ts.getTime, windowMs) * windowMs
            s = s.copy(open = s.open.updated(w, s.open.getOrElse(w, 0L) + 1L))
          }
          // close every window the watermark has passed, oldest first —
          // the order that makes the EW fold schedule-independent
          val wm = state.getCurrentWatermarkMs()
          val (toClose, stillOpen) =
            s.open.partition { case (w, _) => w + windowMs <= wm }
          val out = toClose.toSeq.sortBy(_._1).map { case (w, n) =>
            val std = math.sqrt(s.varr)
            val z = if (std > 0.0) (n.toDouble - s.mean) / std else 0.0
            val alert = RateAlert(typ, new java.sql.Timestamp(w),
              new java.sql.Timestamp(w + windowMs), n, s.mean, std, z,
              s.nClosed >= minBaseline && math.abs(z) > zThreshold)
            // EW update AFTER scoring (West's incremental EW variance).
            // The FIRST closed window SEEDS the baseline (mean = its own
            // count, varr = 0) instead of EW-blending against the zero
            // prior: blending would leave mean = alpha·n (zero-biased)
            // and varr = (1-alpha)·alpha·n² (inflated by the distance
            // from an arbitrary 0), deflating z for several windows — a
            // genuine anomaly right after minBaseline could be missed.
            s = if (s.nClosed == 0L)
              s.copy(mean = n.toDouble, varr = 0.0, nClosed = 1L)
            else {
              val diff = n.toDouble - s.mean
              val incr = alpha * diff
              s.copy(mean = s.mean + incr,
                varr = (1.0 - alpha) * (s.varr + diff * incr),
                nClosed = s.nClosed + 1)
            }
            alert
          }
          s = s.copy(open = stillOpen)
          state.update(s)
          // wake when the oldest open window becomes closable (the
          // partition above guarantees these ends are > watermark,
          // which EventTimeTimeout requires)
          if (stillOpen.nonEmpty)
            state.setTimeoutTimestamp(stillOpen.keys.min + windowMs)
          out.iterator
      }
  }

  /** Production-shaped sink: `foreachBatch` writing each micro-batch to
    * a deterministic `batch_id=<id>` subdirectory with OVERWRITE — the
    * write is idempotent per batch id, so when Structured Streaming
    * replays the last uncommitted micro-batch after a crash/restart the
    * replay lands on the same path instead of appending duplicates
    * (exactly-once output on top of the checkpoint's at-least-once
    * redelivery). Also the natural place for per-batch side effects
    * (DQ counters, metrics). Blocks until the source drains.
    *
    * Read the sink back with [[readSink]] (the `batch_id=` layout is a
    * partition column readers usually don't want).
    */
  def runToParquet(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String,
      transform: DataFrame => DataFrame): Unit = {
    val q = transform(read(spark, srcDir))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .start()
    drain(q)
  }

  /** Read a [[runToParquet]] sink directory, dropping the `batch_id`
    * partition-discovery column.
    */
  def readSink(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("batch_id")

  /** Stream → durable sketch state: each micro-batch of raw events is
    * absorbed into [[graft.operators.SketchStore]] via foreachBatch —
    * the streaming ingest face of the persisted sketch tier (q145's
    * absorb path fed by a stream instead of a batch job). No transform
    * state lives in the stream itself: the STORE is the state, and its
    * max/set-min merge semantics make the sink idempotent under
    * Structured Streaming's at-least-once batch replay — a redelivered
    * micro-batch re-absorbs to bit-identical state, so this sink gets
    * exactly-once for free WITHOUT [[runToParquet]]'s overwrite-by-
    * batch-id discipline (which exists because row appends are not
    * idempotent; sketch merges are). After any prefix of micro-batches
    * the store equals a one-shot absorb of the same rows
    * (EventStreamSpec pins it, including a full fresh-checkpoint
    * redelivery). Blocks until the source drains.
    */
  def absorbToStore(spark: SparkSession, srcDir: String, storeDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 0): Unit = {
    val src = spark.readStream.schema(schema)
    val withTrigger =
      if (maxFilesPerTrigger > 0)
        src.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else src
    val q = withTrigger.parquet(srcDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.SketchStore.update(batch.sparkSession, storeDir, batch)
      }
      .start()
    drain(q)
  }

  /** Block until the source drains, then stop — in try/finally, so a
    * micro-batch failure (processAllAvailable rethrows it) can't leak
    * an active-but-dead query that pins the checkpoint location for
    * the session's lifetime ("Cannot start a query with the same
    * checkpoint as an active query" on every retry).
    */
  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    try q.processAllAvailable()
    finally q.stop()

  /** Exactly-once event dedup on a stream: drop event_id duplicates that
    * arrive within the watermark window (at-least-once sources — Kafka
    * redeliveries, retried producers — made idempotent at ingest).
    * `dropDuplicatesWithinWatermark` keeps state only for the watermark
    * horizon, so state is bounded at 100 TB/day rates — unlike plain
    * `dropDuplicates`, whose keyed state grows forever.
    */
  def dedupe(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase joined to ALL of the
    * same user's clicks in the preceding `lookback` — multi-touch
    * attribution, one output row per (purchase, click) pair; reduce on
    * max(click_ts) per purchase downstream for a last-touch view. Both
    * sides are watermarked and the join condition bounds event-time on
    * both sides, so Spark can expire state (an unbounded stream-stream
    * join would hold both streams forever).
    */
  def purchaseAttribution(events: DataFrame,
      watermark: String = "10 minutes",
      lookback: String = "1 hour"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookback") &&
        col("click_ts") <= col("purchase_ts"),
      "inner")
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Windowed SKETCH aggregation: the mergeable UDAFs
    * ([[graft.functions.KmvSketch]] + [[graft.functions.HllSketch]]
    * distinct users, [[graft.functions.FreqSketch]] heavy event types,
    * [[graft.functions.CountMin]] per-type frequencies) dropped into a
    * watermarked tumbling-window `agg` UNCHANGED — Structured Streaming
    * keeps each window's O(k)/O(d·w)/O(m) sketch buffer in the state
    * store and merges micro-batch partials with the same `merge` the
    * batch path uses, so stream state per window is k longs + a
    * ≤k-entry map + a d·w counter matrix + m registers regardless of
    * traffic.
    *
    * The sketches compose into the full streaming answer without any
    * exact recount pass: MG says WHICH types are heavy
    * (`heavy_type_candidates`, guaranteed superset), CMS says HOW OFTEN
    * each candidate occurred (`heavy_type_est`, one-sided ≥ truth,
    * overcount ≤ εn), KMV/HLL say HOW MANY distinct users drove them
    * (`est_users` unbiased in O(k) values / `est_users_hll` in m
    * registers, the production default) — the state-store resident
    * alternative to q86's exact second pass, which a stream cannot run
    * without reprocessing the window. The bottom-k pair sketch
    * ([[graft.functions.BottomK]], q141's batch form) adds value
    * QUANTILES: a 64-pair uniform sample per window
    * (`bk_value_sample`, micro-units), its type-1
    * p25/p50/p75/p95 reads (`est_value_p{q}_micro` — q141's full
    * column set, face parity), and the DKW/Massart rank-error bound
    * for that sample size (`eps_rank_ppm`) — the rank statistic no
    * counting sketch can answer, carrying its own guarantee.
    *
    * KMV, CMS, and HLL state are pure functions of the window's input
    * SET/MULTISET/SET respectively, so the streamed result is
    * bit-identical to a batch replay of the same rows under ANY trigger
    * schedule (EventStreamSpec asserts equality; the estimate columns
    * inherit the guarantee). The MG map is merge-order-dependent
    * internally but its GUARANTEE is schedule-independent: every type
    * with true count > n/(k+1) is present.
    *
    * HLL small-range correction (the q140 convention): `est_users_hll`
    * is the RAW estimator, which is badly biased below ~2.5m distinct —
    * a window with ZERO non-null users reports ~α·m ≈ 184, not 0. So the
    * face also emits `hll_zero_regs` (still-empty register count V) and
    * `est_users_hll_lc_micro` (the m·ln(m/V) linear-counting estimate,
    * micro-quantized through [[graft.functions.MathLn]]): consumers use
    * the LC column while any register is empty and the raw column once
    * all registers fill — exactly the branch q140's batch query emits.
    */
  /** The stream face's bottom-k sample size (pairs kept per window) —
    * NOT the KMV `k` parameter: 64 pairs is the state-store budget per
    * open window, and `eps_rank_ppm` is derived from THIS constant
    * (δ = 0.01, q141's BkDelta).
    */
  private val BkPairs = 64

  /** Type-1 order-statistic read at percent `q` off the emitted
    * bottom-k sample array — q141's ⌈q·m/100⌉ index (integer `div` on
    * non-negative operands), guarded for the empty-sample window.
    */
  private def bkQuantile(q: Int): org.apache.spark.sql.Column =
    when(size(col("bk_value_sample")) > 0,
      expr(s"element_at(bk_value_sample, " +
        s"CAST(($q * size(bk_value_sample) + 99) DIV 100 AS INT))"))

  /** The stream face's WEIGHTED bottom-k sample size — q151's sketch at
    * the same per-window budget as [[BkPairs]].
    */
  private val WbPairs = 64

  /** q151's two-branch weighted quantile read, array form, over the
    * emitted `wb_value_sample` (value, weight) struct pairs and the
    * `n_wb`/`wb_ws` columns: EXACT cumulative-mass read (smallest value
    * whose cumulative weight reaches q·W) when the window's positive
    * values all fit in the sample (m = n — nothing dropped), PPS
    * uniform order-statistic read when saturated; NULL when the window
    * carried no positive value (a mass-less window has no mass
    * quantiles). Interpreted HOFs over a ≤[[WbPairs]]-element array —
    * the established bounded-array dispensation. The cumulative
    * accumulator runs in DECIMAL(38,0): value micros reach ~1e18
    * (DECIMAL(18,6)·1e6), so 64 of them times the ·100 comparison scale
    * would overflow a long accumulator under ANSI on a hostile feed.
    */
  private def wbQuantile(q: Int): org.apache.spark.sql.Column = {
    val m = size(col("wb_value_sample"))
    val satRead = expr("transform(wb_value_sample, x -> x._1)")
    val exactRead = expr(s"""aggregate(wb_value_sample,
        named_struct('cum', CAST(0 AS DECIMAL(38,0)), 'ans', CAST(NULL AS BIGINT)),
        (acc, x) -> named_struct(
          'cum', CAST(acc.cum + x._2 AS DECIMAL(38,0)),
          'ans', coalesce(acc.ans,
            CASE WHEN (acc.cum + x._2) * 100 >= $q * wb_ws THEN x._1 END)),
        acc -> acc.ans)""")
    when(m > 0,
      when(m.cast("long") === col("n_wb"), exactRead)
        .otherwise(element_at(satRead,
          expr(s"CAST(($q * size(wb_value_sample) + 99) DIV 100 AS INT)"))))
  }

  def windowedSketches(events: DataFrame,
      window: String = "1 hour",
      watermark: String = "10 minutes",
      k: Int = 16): DataFrame = {
    import graft.functions.{Affine61, BottomK, CountMin, FreqSketch, HllSketch, KmvSketch, MathLn, PolyHash61Str}
    // events.user_id is nullable (anonymous traffic): the UDAF input is
    // a primitive Long, so a NULL would abort the stream — coalesce to
    // the negative skip-sentinel the sketch ignores (distinct NON-NULL
    // users, COUNT(DISTINCT) semantics)
    val kmv = KmvSketch.kmvSketch(
      coalesce(Affine61.affine61(col("user_id"),
        KmvSketch.kmvA, KmvSketch.kmvB), lit(-1L)), k)
    // HLL takes the md5 60-bit hash, not the polyhash∘affine family:
    // its rank statistic reads the geometric tail of the hash
    // distribution, which the affine family measurably fails on the
    // consecutive ids real traffic has (see HllSketch's scaladoc)
    val hllHash = coalesce(
      HllSketch.hash60(col("user_id").cast("string")), lit(-1L))
    // q141's bottom-k sketch on the stream face: a 64-pair uniform
    // sample of each window's event VALUES keyed by the event-id hash.
    // Values ride as exact integer micro-units (decimal route — the
    // q139/q141 cents convention), and the hash is gated on the DERIVED
    // micros, not the raw value: a NaN/Inf or decimal(18,6)-overflowing
    // value passes isNotNull but NULLs out of the decimal route, and a
    // NULL reaching the UDAF's primitive tuple input decodes as 0 — a
    // silent bogus 0-micro sample entry on a dirty feed (q141's batch
    // gate, the c2ee2cd convention).
    // outer coalesce: a NULL event_id nulls the hash THROUGH the when
    // branch, and a NULL hash reaching the UDAF decodes as 0 — the
    // always-kept minimum. -1 skips the row instead.
    // try_cast, not cast: ANSI maps only NaN/Inf to NULL on
    // double→decimal — a finite value beyond ±1e12 THROWS
    // (NUMERIC_VALUE_OUT_OF_RANGE, the q16 lesson); try_cast makes the
    // whole non-representable class NULL, which the hash gate then skips
    val bkVal = (expr("try_cast(value AS DECIMAL(18,6))") * lit(1000000))
      .cast("long")
    val bkHash = coalesce(when(bkVal.isNotNull,
      Affine61.affine61(
        PolyHash61Str.polyHash61Str(col("event_id").cast("string")),
        BottomK.bkA, BottomK.bkB)), lit(-1L))
    // q151's WEIGHTED bottom-k on the stream face: value-MASS quantiles
    // — each positive value weighted by its own micros, so wp50 is the
    // value level below which half the window's value mass sits (the
    // revenue-concentration KPI), vs p50's "half the EVENTS sit below".
    // Inclusion is weight-proportional via the SHARED aesKey definition
    // (q151's, verbatim) on the wb hash family (≠ bk: the weighted
    // sample must not correlate with the uniform one). Gates: only
    // POSITIVE representable micros carry mass (NULL/NaN/Inf/overflow
    // null out of the try_cast route; zero/negative values have no
    // mass) — everything else takes the −1 skip sentinel. The when()
    // also keeps aesKey's ln away from the sentinel branch (ln at a
    // non-positive draw is ±Inf, whose ANSI long cast throws); a NULL
    // event_id nulls the hash through BOTH branches and the outer
    // coalesce sends it to the sentinel.
    import graft.functions.WeightedBottomK
    val wbKey = coalesce(when(bkVal.isNotNull && bkVal > 0,
      WeightedBottomK.aesKey(
        Affine61.affine61(
          PolyHash61Str.polyHash61Str(col("event_id").cast("string")),
          WeightedBottomK.wbA, WeightedBottomK.wbB),
        bkVal.cast("double") / lit(1000000.0))), lit(-1L))
    val cands = array_sort(map_keys(col("mg_types")))
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(
        count(lit(1)).as("n_events"),
        kmv.as("kmv_users"),
        FreqSketch.freqSketch(col("event_type"), 8).as("mg_types"),
        CountMin.countMin(
          coalesce(PolyHash61Str.polyHash61Str(col("event_type")),
            lit(-1L))).as("cms_types"),
        HllSketch.hll(hllHash).as("hll_users"),
        BottomK.bottomK(bkHash, bkVal, BkPairs).as("bk_value_sample"),
        graft.functions.WeightedBottomK.weightedBottomK(
          wbKey, bkVal, bkVal, WbPairs).as("wb_value_sample"),
        count(when(wbKey >= 0, lit(1))).as("n_wb"))
      .withColumn("est_users_hll",
        expr(HllSketch.estRawSql(HllSketch.sumSql("hll_users"))))
      .withColumn("hll_zero_regs",
        expr(HllSketch.zerosSql("hll_users")).cast("long"))
      // the window's kept value mass, DECIMAL(38,0) (see wbQuantile)
      .withColumn("wb_ws",
        expr("aggregate(wb_value_sample, CAST(0 AS DECIMAL(38,0)), " +
          "(acc, x) -> CAST(acc + x._2 AS DECIMAL(38,0)))"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_events"),
        KmvSketch.estimate(col("kmv_users"), k).as("est_users"),
        col("kmv_users"),
        col("est_users_hll"),
        col("hll_zero_regs"),
        when(col("hll_zero_regs") > 0,
          floor(MathLn.ln(lit(HllSketch.M.toDouble) /
            col("hll_zero_regs").cast("double")) *
            lit(HllSketch.M * 1000000.0))
            .cast("long")).as("est_users_hll_lc_micro"),
        col("hll_users"),
        col("bk_value_sample"),
        // q141 column-set parity: all four quantile targets read off
        // the sample's order statistics (type-1, ⌈q·m/100⌉ — the same
        // reads as the batch form), NULL when the window had no
        // non-null values — a sample-less window has no quantiles, it
        // doesn't have quantile zero. eps_rank_ppm is the DKW/Massart
        // rank-error guarantee for THIS face's k-pair sample (same
        // δ=0.01 as q141's BkDelta), so the stream answer carries its
        // own bound exactly like the batch answer does.
        bkQuantile(25).as("est_value_p25_micro"),
        bkQuantile(50).as("est_value_p50_micro"),
        bkQuantile(75).as("est_value_p75_micro"),
        bkQuantile(95).as("est_value_p95_micro"),
        lit(BottomK.epsPpm(BkPairs, 0.01)).as("eps_rank_ppm"),
        // q151 column-set parity: weighted (value-MASS) quantiles off
        // the weighted sample — exact when the window's positive values
        // fit in WbPairs, PPS uniform read when saturated; NO rank
        // bound emitted (no DKW analogue for weighted WOR — q151's
        // documented trade, same on both faces)
        col("wb_value_sample"),
        col("n_wb"),
        col("wb_ws").cast("double").as("wb_mass_kept"),
        wbQuantile(25).as("est_value_wp25_micro"),
        wbQuantile(50).as("est_value_wp50_micro"),
        wbQuantile(75).as("est_value_wp75_micro"),
        wbQuantile(95).as("est_value_wp95_micro"),
        // array_sort: the MG map's key ORDER is merge-order-dependent
        // (schedule-varying) even though the key SET is guaranteed —
        // sort so the emitted column is deterministic across runs
        cands.as("heavy_type_candidates"),
        // each MG candidate probed against the window's CMS: the
        // estimate is a pure expression over (matrix, key), so the map
        // is as deterministic as its inputs — sorted keys, summed cells
        map_from_arrays(cands,
          transform(cands, t =>
            CountMin.estimate(col("cms_types"),
              PolyHash61Str.polyHash61Str(t)))).as("heavy_type_est"),
        col("cms_types"))
  }

  /** Run a streaming query over `srcDir` into an in-memory table and
    * block until the source is drained (the local test/verify harness;
    * a production run would use runToParquet).
    */
  def runToMemory(spark: SparkSession, srcDir: String, name: String,
      transform: DataFrame => DataFrame): DataFrame = {
    val q = transform(read(spark, srcDir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    drain(q)
    spark.table(name)
  }
}
