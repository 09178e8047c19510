package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tenth registry-wide totality sweep: MAXIMAL-LENGTH UNIFORM TOKENS —
  * the two degenerate token-stream shapes a crawl eventually ingests
  * that no other sweep produces:
  *
  *   - doc 0 becomes ONE unbroken ~60k-char token (a minified blob /
  *     base64 dump with no whitespace): the tokenizer yields a single
  *     enormous token, shingles/winnow/packing all see k > n, and the
  *     BPE kernels must walk a 60k-symbol word without blowing up;
  *   - doc 1 becomes the SAME 2-char token repeated 20k times: every
  *     gram hash is identical, so winnowing's window-minimum
  *     tie-breaking, SharedSpan's rolling-hash index (all positions
  *     collide), the repetition/entropy gates (1 distinct shingle,
  *     near-zero entropy), and BPE's self-overlapping (aa,aa) merge
  *     cascades all hit their worst case at scale.
  *
  * Every registry query must be total (no throw, no hang), and the
  * degenerate docs must actually FLOW through the row-local stats
  * rather than being silently dropped.
  */
class UniformTokenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val MonoTokenId = 0L // one giant unbroken token
  private val RepeatId = 1L    // one short token repeated 20k times

  private lazy val monoToken: String = "x" * 60000
  private lazy val repeated: String = Seq.fill(20000)("aa").mkString(" ")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_uniform").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out =
        if (t == "documents")
          df.withColumn("text",
              when(col("doc_id") === MonoTokenId, lit(monoToken))
                .when(col("doc_id") === RepeatId, lit(repeated))
                .otherwise(col("text")))
            .withColumn("n_chars",
              when(col("doc_id") === MonoTokenId, lit(monoToken.length.toLong))
                .when(col("doc_id") === RepeatId, lit(repeated.length.toLong))
                .otherwise(col("n_chars")))
        else df
      out.write.parquet(s"$d/$t.parquet")
    }
    d
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total with maximal-length uniform tokens") {
      fn(spark, dir).collect() // must not throw
    }

  test("the degenerate docs flow: stats rows present with the expected shapes") {
    import spark.implicits._
    val stats = SparkEntry.queries("q28_text_stats")(spark, dir)
      .filter($"doc_id".isin(MonoTokenId, RepeatId))
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
    assert(stats(MonoTokenId) == 1L,
      s"unbroken blob must tokenize to exactly one token: $stats")
    assert(stats(RepeatId) == 20000L,
      s"repeated doc must tokenize to 20k tokens: $stats")
    // the repetition gate must catch the uniform doc (1 distinct
    // shingle over ~20k shingles), and never flag the single-token blob
    // (no shingles at all — nothing to repeat)
    val rep = SparkEntry.queries("q126_filter_stack")(spark, dir)
      .filter($"doc_id".isin(MonoTokenId, RepeatId))
      .select($"doc_id", $"reason").as[(Long, String)].collect().toMap
    assert(rep(RepeatId) == "repetitive", rep.toString)
    assert(rep(MonoTokenId) != "repetitive", rep.toString)
  }
}
