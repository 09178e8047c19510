package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted side of incremental EXACT-SUBSTRING dedup — q128's
  * [[DedupIndex]] analogue, completing the per-tier story: every dedup
  * tier (whole-doc near-dup via the band index, exact spans via this)
  * has an O(batch) ingest path against durable state.
  *
  * The index holds one row per (fingerprint, doc_id) — the winnowed
  * 40-gram fingerprints of every admitted document — BUCKETED on the
  * probe join key (fingerprint), so an ingest batch computes only its
  * own fingerprints and equi-joins them against the index with the
  * corpus side read in place (no re-exchange; SpanIndexSpec asserts it
  * from the physical plan, the DedupIndexSpec MO). Candidates then
  * verify with the exact [[graft.functions.SharedSpan]] kernel against
  * only the docs the probe surfaced.
  *
  * The winnowing guarantee carries over unchanged: a new document
  * sharing a ≥ [[DedupQueries.SpanTokens]]-token run with ANY admitted
  * document shares at least one selected fingerprint with it, so the
  * probe has no false negatives; SharedSpan kills false positives.
  */
object SpanIndex {

  /** Build and persist the fingerprint index for `docs` (doc_id, text),
    * bucketed and per-bucket sorted on fp.
    */
  def write(docs: DataFrame, table: String, nBuckets: Int): Unit = {
    val spark = docs.sparkSession
    // crashed-writer hygiene (the DedupIndex.write convention)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = org.apache.hadoop.fs.FileSystem.get(loc,
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fingerprints(docs)
      .write
      .format("parquet")
      .bucketBy(nBuckets, "fp")
      .sortBy("fp")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** (doc_id, fp) winnowed fingerprints for any (doc_id, text) frame —
    * the q128 candidate key, distinct per document by construction.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.WinnowFingerprints.winnow(col("text"),
        DedupQueries.SpanGramK, DedupQueries.SpanWinnowW)).as("fp"))

  /** Probe the persisted index with a new batch: distinct candidate
    * (new_id, corpus_id) pairs sharing a fingerprint. Only the batch
    * side shuffles.
    */
  def probeCandidates(spark: SparkSession, table: String,
      newDocs: DataFrame): DataFrame = {
    val fresh = fingerprints(newDocs)
      .select(col("fp"), col("doc_id").as("new_id"))
    spark.table(table)
      .select(col("fp"), col("doc_id").as("corpus_id"))
      .join(fresh, Seq("fp"))
      .select(col("new_id"), col("corpus_id")).distinct()
  }

  /** Incremental exact-substring flags for a new batch against the
    * admitted corpus: probe → SharedSpan verify → earliest admitted
    * sharer, the q128 output convention ((doc_id, n_tokens,
    * is_exact_dup, dup_of) with -1 when clean). Cost is O(batch +
    * candidates) — the corpus is touched only for candidate rows.
    */
  def flagIncremental(spark: SparkSession, table: String,
      corpusDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val base = newDocs.select(col("doc_id"), col("text"))
    val cand = probeCandidates(spark, table, base)
    val verified = cand
      .join(base.select(col("doc_id").as("new_id"), col("text").as("b_text")),
        Seq("new_id"))
      .join(corpusDocs.select(col("doc_id").as("corpus_id"),
          col("text").as("a_text")),
        Seq("corpus_id"))
      .filter(graft.functions.SharedSpan.sharedSpan(col("a_text"),
        col("b_text"), DedupQueries.SpanTokens))
      .groupBy(col("new_id")).agg(min(col("corpus_id")).as("dup_of"))
    base.select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n_tokens"))
      .join(verified.withColumnRenamed("new_id", "doc_id"),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        col("dup_of").isNotNull.cast("int").as("is_exact_dup"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
      .orderBy(col("doc_id"))
  }
}
