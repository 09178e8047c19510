package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must be total when one document is ~200× the
  * corpus norm — the concatenated-site scrape / log-dump page every
  * crawl eventually ingests. The giant doc stresses the fused text
  * kernels (TextStats, Shingles, MinHashSig, SimHash: single-row loops
  * over ~200k chars / ~30k tokens), the shingle-keyed joins it fans
  * into, and the packing/chunking arithmetic (q74/q96 token windows).
  * Queries must not throw, and the doc must actually FLOW: it appears
  * in text stats and chunks into many pieces rather than one.
  */
class OversizeDocSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ~200k chars of varied sentence text (distinct-ish shingles, so the
  // shingle set is genuinely large, not one repeated 3-gram)
  private lazy val giant: String =
    (0 until 6000).map(i =>
      s"record $i of the oversized concatenated page dump with token${i % 997} " +
        s"and marker${i % 331}").mkString(" ")

  private val GiantId = 0L // doc_id 0 exists at sf0.001

  private lazy val giantDir: String = {
    val dir = Files.createTempDirectory("graft_giant").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out =
        if (t == "documents")
          df.withColumn("text",
              when(col("doc_id") === GiantId, lit(giant)).otherwise(col("text")))
            .withColumn("n_chars",
              when(col("doc_id") === GiantId, lit(giant.length.toLong))
                .otherwise(col("n_chars")))
        else df
      out.write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total with an oversized document") {
      fn(spark, giantDir).collect() // must not throw
    }

  test("the giant doc flows: stats row present, chunked into many pieces") {
    import spark.implicits._
    val stats = SparkEntry.queries("q28_text_stats")(spark, giantDir)
      .filter($"doc_id" === GiantId).collect()
    assert(stats.length == 1, "giant doc missing from text stats")
    val chunks = SparkEntry.queries("q96_chunk_overlap")(spark, giantDir)
      .filter($"doc_id" === GiantId).count()
    assert(chunks > 10, s"giant doc produced only $chunks chunks")
  }
}
