package graft.streaming

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming incremental dedup against its batch oracle: feeding the
  * corpus through [[DocStream.dedupStream]] in ingest-order drops must
  * produce, for the final drop, EXACTLY the rows q71 computes for the
  * same new-vs-corpus split — the stream is the incremental execution
  * of the same dataflow, state persisted in the bucketed band index.
  */
class DocStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("streaming dedup: final drop's matches equal q71's batch result") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars").cache()
    val base = Files.createTempDirectory("graft_docstream").toString
    val dropDir = s"$base/drops"
    Files.createDirectories(java.nio.file.Paths.get(dropDir))
    val st = DocStream.DedupState(
      indexTable = "docstream_band_idx",
      docsPath = s"$base/admitted",
      matchesPath = s"$base/matches")
    spark.sql(s"DROP TABLE IF EXISTS `${st.indexTable}`")
    val q = DocStream.dedupStream(DocStream.read(spark, dropDir), st)
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      // three ingest drops in q71's split order: corpus (%3 == 0, then
      // %3 == 1) admitted first, the probe batch (%3 == 2) last. One
      // part file per drop so each is exactly one micro-batch.
      for (m <- 0L to 2L) {
        docs.filter($"doc_id" % 3 === m).coalesce(1)
          .write.mode("append").parquet(dropDir)
        q.processAllAvailable()
      }
    } finally q.stop()

    val emitted = spark.read.parquet(st.matchesPath)
    // drop 0 saw an empty corpus: no matches partition, no self-matches
    assert(emitted.filter($"batch" === 0).count() == 0)
    // the final drop replays q71's exact split — row-identical result
    val streamed = emitted.filter($"batch" === 2)
      .select($"new_id", $"corpus_id", $"jaccard", $"is_dup")
      .collect().map(_.toSeq).toSet
    val batch = graft.SparkEntry.queries("q71_incremental_dedup")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
    // every document was admitted exactly once
    assert(spark.read.parquet(st.docsPath).count() == docs.count())
    // intermediate drops only ever match EARLIER drops (prefix semantics)
    val mid = emitted.filter($"batch" === 1)
    assert(mid.filter($"new_id" % 3 =!= 1).count() == 0)
    assert(mid.filter($"corpus_id" % 3 =!= 0).count() == 0)
    spark.sql(s"DROP TABLE IF EXISTS `${st.indexTable}`")
    docs.unpersist()
  }
}
