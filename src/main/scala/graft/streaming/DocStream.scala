package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

import graft.operators.{DedupIndex, DedupQueries}

/** Structured Streaming over a document feed — the streaming face of the
  * incremental-dedup pipeline (q71/[[DedupIndex]]).
  *
  * The design choice that matters at 100 TB: dedup state does NOT live
  * in executor state-store memory (a `flatMapGroupsWithState` over
  * (band, bucket) groups would grow state with the corpus forever — the
  * unbounded-state anti-pattern). It lives in persisted, restart-safe
  * artifacts, and — since round 7 — every per-batch write is KEYED BY
  * BATCH ID and written with overwrite, so an at-least-once foreachBatch
  * replay rewrites its own partition instead of duplicating rows:
  *
  *   - matches land under `matches/batch=<id>` (overwrite);
  *   - admitted docs land under `docs/batch=<id>` (overwrite);
  *   - the batch's LSH band keys land under `index_delta/batch=<id>`
  *     (overwrite). The corpus-scale BUCKETED band index ([[DedupIndex]],
  *     hash-clustered on the probe join key so probes shuffle only the
  *     batch) is created EMPTY up front and populated only by
  *     [[compact]], which folds the accumulated deltas in — an LSM
  *     shape: writes go to small idempotent deltas, reads probe
  *     base ∪ deltas, a periodic compaction keeps the base carrying
  *     ~all rows so the probe stays effectively exchange-free.
  *
  * Candidate pairs are `distinct()`, so even a crash *inside* compaction
  * (deltas folded into the base but not yet deleted) only duplicates
  * index rows, never match rows; the next compaction restores counts —
  * the same idempotence argument transactional formats make, built from
  * plain parquet.
  */
object DocStream {

  /** documents schema as a stream source would emit it. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of parquet document drops, one
    * drop per trigger (each ingest file becomes one micro-batch).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

  /** Where the stream keeps its persisted dedup state and output. */
  final case class DedupState(
      indexTable: String,
      docsPath: String,
      matchesPath: String,
      nBuckets: Int = 8,
      verifyThreshold: Double = 0.5,
      dupThreshold: Double = 0.8)

  /** Batch-keyed band-key deltas awaiting compaction into the bucketed
    * base table (sibling of the docs store, so all durable state shares
    * one root).
    */
  private[streaming] def deltaDir(st: DedupState): String =
    s"${st.docsPath}_index_delta"

  /** The streaming incremental dedup: every micro-batch of documents is
    * checked against everything admitted before it (q71's new-vs-corpus
    * semantics — batch-internal pairs are the full pipeline's job, run
    * periodically). Start with `.start()` on the returned writer.
    */
  def dedupStream(docs: DataFrame, state: DedupState): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, state))

  /** One micro-batch of the q71 dataflow against the persisted state.
    * Probe + verify run BEFORE the admit writes, so a document never
    * matches itself; candidates join the docs store only for the rows
    * the index probe surfaced. Every write is batch-keyed overwrite —
    * re-running the same (batch, batchId) leaves all state row counts
    * unchanged (DocStreamSpec replays a batch to pin exactly that).
    *
    * Replay VALUE-idempotence (r10 ADVICE): the corpus side — both the
    * delta probes and the doc-text join — is restricted to batch
    * partitions with id < the CURRENT batchId. A replay (same
    * checkpoint or a fresh one re-processing the same drops in order)
    * therefore sees exactly the state the original run saw: a stale
    * candidate surfaced by the compacted base against a LATER-admitted
    * doc drops at the corpus join, so a match can never point at a
    * later document and the earliest-sharer convention survives
    * re-processing, value-for-value, not just count-for-count.
    */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      st: DedupState): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col("doc_id"), col("text")).persist()
    try {
      if (!spark.catalog.tableExists(st.indexTable)) {
        // a missing base alongside a NON-empty admitted store means a
        // crash hit compact() between its DROP and its commit — rebuild
        // from the source of truth instead of creating an empty base
        // (which would silently drop all compacted probe state)
        if (BatchStore.listBatchIds(spark, st.docsPath).nonEmpty)
          compact(spark, st)
        else DedupIndex.write(b.limit(0), st.indexTable, st.nBuckets)
      }
      val priorBatches = BatchStore.listBatchIds(spark, st.docsPath)
        .filter(_ < batchId)
      val cand = probeAll(spark, st, b, batchId, priorBatches)
      if (cand.nonEmpty) {
        val corpus = spark.read
          .parquet(priorBatches.map(id => s"${st.docsPath}/batch=$id"): _*)
        val matches = DedupQueries.verifyCandidates(cand.get, b, corpus)
          .filter(col("jaccard") >= st.verifyThreshold)
          .withColumn("is_dup",
            (col("jaccard") >= st.dupThreshold).cast("int"))
        matches.write.mode("overwrite")
          .parquet(s"${st.matchesPath}/batch=$batchId")
      }
      // admit: band keys to this batch's delta partition, docs to this
      // batch's docs partition — both full-partition overwrites
      DedupQueries.bandIndex(b).write.mode("overwrite")
        .parquet(s"${deltaDir(st)}/batch=$batchId")
      b.write.mode("overwrite").parquet(s"${st.docsPath}/batch=$batchId")
    } finally b.unpersist()
  }

  /** Candidate (new_id, corpus_id) pairs for `b` against base ∪ deltas
    * from batches admitted BEFORE `batchId`; None when no prior batch
    * exists (first batch, or a replay of it).
    */
  private def probeAll(spark: SparkSession, st: DedupState,
      b: DataFrame, batchId: Long, priorBatches: Seq[Long]): Option[DataFrame] = {
    if (priorBatches.isEmpty) return None
    val base = DedupIndex.probeCandidates(spark, st.indexTable, b)
    val dd = deltaDir(st)
    // list batch partitions explicitly: a concurrent compact may leave
    // the root present but empty (schema inference over an empty dir
    // throws), and listing pins exactly which deltas this probe reads;
    // only PRIOR deltas probe (replay value-idempotence — see
    // processBatch), the rest drop at the corpus join anyway
    val deltaBatches = BatchStore.listBatchIds(spark, dd).filter(_ < batchId)
    val withDelta =
      if (deltaBatches.isEmpty) base
      else {
        val fresh = DedupQueries.bandIndex(b)
          .select(col("band"), col("bucket"), col("doc_id").as("new_id"))
        val deltaCand = spark.read
          .parquet(deltaBatches.map(id => s"$dd/batch=$id"): _*)
          .select(col("band"), col("bucket"), col("doc_id").as("corpus_id"))
          .join(fresh, Seq("band", "bucket"))
          .select(col("new_id"), col("corpus_id"))
        base.unionByName(deltaCand)
      }
    // exclude the batch's own documents from the corpus side: the
    // compacted base is not batch-keyed, so a replayed batch still
    // probes an index containing itself — without this, every replayed
    // document matches its own admitted copy (and q71 semantics exclude
    // batch-internal pairs anyway)
    Some(withDelta.distinct()
      .join(b.select(col("doc_id").as("corpus_id")), Seq("corpus_id"),
        "left_anti"))
  }

  /** Streaming CURATION GATE: run the q126 filter stack (row-local
    * signals + reason ladder, [[graft.operators.TextQueries
    * .filterStack]]) over every ingest micro-batch, landing labeled
    * documents AND the per-batch reason-code histogram — the live
    * drop-reason dashboard a production ingest watches — under
    * batch-keyed overwrite partitions (the established idempotent-
    * replay convention: an at-least-once redelivery rewrites its own
    * partition, counts never double).
    *
    * Because the stack is one stateless map pass, stream and batch
    * labels are IDENTICAL by construction — no watermark, no state
    * store, no ordering sensitivity; DocStreamSpec pins label parity
    * and histogram-vs-labels consistency across trigger schedules. At
    * 100 TB this is the shape where curation rides the ingest scan for
    * free instead of being a second corpus pass.
    */
  def filterStream(docs: DataFrame, outPath: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) => {
        val labeled = graft.operators.TextQueries.filterStack(
          batch.select(col("doc_id"), col("lang"), col("text")))
        labeled.write.mode("overwrite")
          .parquet(s"$outPath/labeled/batch=$batchId")
        // histogram derived from the labeled frame (one source of
        // truth); tiny (#reasons rows), coalesced to one file
        labeled.groupBy(col("reason"))
          .agg(count(lit(1)).as("n_docs"))
          .coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$outPath/reasons/batch=$batchId")
      })

  /** Streaming TRAINED-MODEL scoring: apply a FROZEN weight vector
    * ([[graft.operators.TrainingQueries.qcTrain]] output — trained
    * offline on the batch corpus, deployed as O(d) literals; 4 dims =
    * the q135 trio, 7 = the q137 production feature set — the weight
    * dimension selects the featurizer) to every ingest micro-batch —
    * the serve-time shape of the learned quality gate, and the
    * production division of labor: training stays a batch job over the
    * full corpus, the stream pays only one stateless row-local map per
    * document. Batch-keyed overwrite partitions keep replays
    * idempotent (the filterStream convention). Because scoring is
    * row-local with frozen weights, stream and batch scores are
    * IDENTICAL by construction — DocStreamSpec pins parity across
    * trigger schedules for both models.
    */
  def scoreStream(docs: DataFrame, weights: Array[Double],
      outPath: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) => {
        graft.operators.TrainingQueries.scoreWith(
            batch.select(col("doc_id"), col("source"), col("lang"),
              col("text")),
            weights)
          .write.mode("overwrite")
          .parquet(s"$outPath/scored/batch=$batchId")
      })

  /** Where streaming exact-substring dedup keeps its persisted state:
    * the fp-bucketed [[graft.operators.SpanIndex]] base table, the
    * admitted-docs store, per-batch flag output, and fingerprint
    * deltas awaiting [[compactSpans]].
    */
  final case class SpanState(
      indexTable: String,
      docsPath: String,
      flagsPath: String,
      nBuckets: Int = 8)

  private[streaming] def spanDeltaDir(st: SpanState): String =
    s"${st.docsPath}_span_delta"

  /** Streaming EXACT-SUBSTRING dedup (q128's stream face — the same
    * LSM shape as [[dedupStream]], over the span tier): each
    * micro-batch probes the persisted fingerprint base ∪ deltas for
    * ≥50-token shared-span candidates against everything admitted
    * before it, verifies with the exact SharedSpan kernel, lands the
    * q128-convention flags for the batch, and admits its fingerprints
    * as a batch-keyed delta. All writes are batch-keyed overwrite —
    * replays rewrite their own partitions. Batch-internal span pairs
    * are the periodic full pipeline's job (the q71 convention).
    */
  def spanStream(docs: DataFrame, state: SpanState): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        processSpanBatch(batch, batchId, state))

  private[streaming] def processSpanBatch(batch: DataFrame, batchId: Long,
      st: SpanState): Unit = {
    import graft.operators.{DedupQueries, SpanIndex}
    val spark = batch.sparkSession
    val b = batch.select(col("doc_id"), col("text")).persist()
    try {
      if (!spark.catalog.tableExists(st.indexTable)) {
        if (BatchStore.listBatchIds(spark, st.docsPath).nonEmpty)
          compactSpans(spark, st)
        else SpanIndex.write(b.limit(0), st.indexTable, st.nBuckets)
      }
      // probe base ∪ deltas; verify; flag (earliest admitted sharer).
      // Replay VALUE-idempotence (r10 ADVICE): delta probes and the
      // corpus text join are restricted to batches with id < the
      // current batchId, so a replay — same checkpoint or a fresh one
      // re-processing the same drops in order — sees exactly the state
      // the original run saw: a stale base candidate against a
      // LATER-admitted doc drops at the corpus join, dup_of can never
      // point at a later document, and the earliest-sharer convention
      // survives re-processing value-for-value (DocStreamSpec pins it).
      val priorBatches = BatchStore.listBatchIds(spark, st.docsPath)
        .filter(_ < batchId)
      val flags =
        if (priorBatches.isEmpty)
          b.select(col("doc_id"),
            size(graft.functions.TextFunctions.tokens(col("text")))
              .cast("long").as("n_tokens"),
            lit(0).as("is_exact_dup"), lit(-1L).as("dup_of"))
        else {
          val base = SpanIndex.probeCandidates(spark, st.indexTable, b)
          val dd = spanDeltaDir(st)
          val deltaBatches = BatchStore.listBatchIds(spark, dd)
            .filter(_ < batchId)
          val cand0 =
            if (deltaBatches.isEmpty) base
            else {
              val fresh = SpanIndex.fingerprints(b)
                .select(col("fp"), col("doc_id").as("new_id"))
              base.unionByName(spark.read
                .parquet(deltaBatches.map(id => s"$dd/batch=$id"): _*)
                .select(col("fp"), col("doc_id").as("corpus_id"))
                .join(fresh, Seq("fp"))
                .select(col("new_id"), col("corpus_id")))
            }
          // the compacted base is not batch-keyed, so a replayed batch
          // still probes an index containing itself — exclude
          val cand = cand0.distinct()
            .join(b.select(col("doc_id").as("corpus_id")), Seq("corpus_id"),
              "left_anti")
          val corpus = spark.read
            .parquet(priorBatches.map(id => s"${st.docsPath}/batch=$id"): _*)
          val verified = cand
            .join(b.select(col("doc_id").as("new_id"), col("text").as("b_text")),
              Seq("new_id"))
            .join(corpus.select(col("doc_id").as("corpus_id"),
                col("text").as("a_text")),
              Seq("corpus_id"))
            .filter(graft.functions.SharedSpan.sharedSpan(col("a_text"),
              col("b_text"), DedupQueries.SpanTokens))
            .groupBy(col("new_id")).agg(min(col("corpus_id")).as("dup_of"))
          b.select(col("doc_id"),
              size(graft.functions.TextFunctions.tokens(col("text")))
                .cast("long").as("n_tokens"))
            .join(verified.withColumnRenamed("new_id", "doc_id"),
              Seq("doc_id"), "left")
            .select(col("doc_id"), col("n_tokens"),
              col("dup_of").isNotNull.cast("int").as("is_exact_dup"),
              coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
        }
      flags.write.mode("overwrite").parquet(s"${st.flagsPath}/batch=$batchId")
      SpanIndex.fingerprints(b).write.mode("overwrite")
        .parquet(s"${spanDeltaDir(st)}/batch=$batchId")
      b.write.mode("overwrite").parquet(s"${st.docsPath}/batch=$batchId")
    } finally b.unpersist()
  }

  /** Fold span-fingerprint deltas into the bucketed base (rebuilt from
    * the admitted store — the [[compact]] crash-safety argument applies
    * unchanged) and drop exactly the deltas the snapshot covers.
    */
  def compactSpans(spark: SparkSession, st: SpanState): Unit = {
    import graft.operators.SpanIndex
    val snapshot = BatchStore.listBatchIds(spark, st.docsPath)
    if (snapshot.isEmpty) return
    val docs = spark.read
      .parquet(snapshot.map(id => s"${st.docsPath}/batch=$id"): _*)
      .select(col("doc_id"), col("text"))
    SpanIndex.write(docs, st.indexTable, st.nBuckets)
    BatchStore.deleteBatches(spark, spanDeltaDir(st), snapshot)
  }

  /** Fold the accumulated delta partitions into the bucketed base table
    * and drop them, restoring the fully exchange-free probe. Rebuilds
    * the base from the admitted-docs store (the source of truth), so it
    * is safe to run at any time — including after a crash that left the
    * base and deltas overlapping, and CONCURRENTLY with an active
    * stream: the docs-store batch listing is snapshotted first, the base
    * is rebuilt from exactly those partitions, and only the delta
    * partitions covered by that snapshot are deleted. A batch admitted
    * mid-compact keeps its delta (probes keep unioning it; the next
    * compact folds it) instead of being silently dropped by a
    * whole-directory delete.
    */
  def compact(spark: SparkSession, st: DedupState): Unit = {
    val snapshot = BatchStore.listBatchIds(spark, st.docsPath)
    if (snapshot.isEmpty) return
    val docs = spark.read
      .parquet(snapshot.map(id => s"${st.docsPath}/batch=$id"): _*)
      .select(col("doc_id"), col("text"))
    DedupIndex.write(docs, st.indexTable, st.nBuckets)
    BatchStore.deleteBatches(spark, deltaDir(st), snapshot)
  }
}
