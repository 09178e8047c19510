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
  * unbounded-state anti-pattern). It lives in the same two persisted,
  * restart-safe artifacts the batch pipeline uses:
  *
  *   - the LSH band index, a parquet table BUCKETED on the probe join
  *     key (band, bucket), so each micro-batch probe shuffles only the
  *     batch ([[DedupIndex]]; exchange-free plan proven in
  *     DedupIndexSpec), and
  *   - the admitted-docs store (doc_id, text), read only for the
  *     candidate rows the probe surfaces.
  *
  * Each micro-batch runs exactly the q71 dataflow: probe → exact-Jaccard
  * verify → emit matches → admit the batch (append its band keys and
  * docs). Matches land under `matches/batch=<id>` with overwrite, so a
  * replayed micro-batch (foreachBatch is at-least-once) rewrites its own
  * partition instead of duplicating rows. The index/docs admits are
  * plain appends — a replayed admit would double rows there; production
  * hardening is a transactional table format or an idempotent
  * batch-keyed layout, orthogonal to the dataflow shown here.
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
    * Probe + verify run BEFORE the admit appends, so a document never
    * matches itself; candidates join the docs store only for the rows
    * the index probe surfaced.
    */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      st: DedupState): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col("doc_id"), col("text")).persist()
    try {
      val hasIndex = spark.catalog.tableExists(st.indexTable)
      if (hasIndex) {
        val cand = DedupIndex.probeCandidates(spark, st.indexTable, b)
        val corpus = spark.read.parquet(st.docsPath)
        val matches = DedupQueries.verifyCandidates(cand, b, corpus)
          .filter(col("jaccard") >= st.verifyThreshold)
          .withColumn("is_dup",
            (col("jaccard") >= st.dupThreshold).cast("int"))
        matches.write.mode("overwrite")
          .parquet(s"${st.matchesPath}/batch=$batchId")
      }
      // admit: append band keys (same bucket spec as the initial write,
      // so the probe's exchange-free layout survives appends) + docs
      if (hasIndex)
        DedupQueries.bandIndex(b).write.format("parquet")
          .bucketBy(st.nBuckets, "band", "bucket")
          .sortBy("band", "bucket")
          .mode("append").saveAsTable(st.indexTable)
      else
        DedupIndex.write(b, st.indexTable, st.nBuckets)
      b.write.mode("append").parquet(st.docsPath)
    } finally b.unpersist()
  }
}
