package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must be total when HALF the corpus is one
  * repeated document — the boilerplate flood (error pages, templated
  * listings, scraped cookie banners dominating a crawl). This is the
  * LSH worst case: all flood docs share every band key, so candidate
  * generation within that bucket is quadratic in the flood size, and
  * dedup resolution produces one giant cluster. The queries must
  * survive it at test scale, and the dedup family must also DO the
  * right thing: one cluster, one keeper.
  */
class DuplicateFloodSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val flood = "the quick brown fox jumps over the lazy dog " +
    "cookie banner accept all rights reserved terms of service apply"

  private lazy val floodDir: String = {
    val dir = Files.createTempDirectory("graft_flood").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out =
        if (t == "documents")
          df.withColumn("text",
            when(col("doc_id") % 2 === 0, lit(flood)).otherwise(col("text")))
        else df
      out.write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total under a duplicate flood") {
      fn(spark, floodDir).collect() // must not throw
    }

  test("dedup resolution collapses the flood to one cluster with one keeper") {
    import spark.implicits._
    val resolved = SparkEntry.queries("q70_dedup_resolve")(spark, floodDir)
      .select($"doc_id", $"canonical_id", $"is_keeper")
      .as[(Long, Long, Int)].collect()
    val floodIds = spark.read.parquet(s"$floodDir/documents.parquet")
      .filter($"doc_id" % 2 === 0).select($"doc_id").as[Long].collect().toSet
    val inFlood = resolved.filter(r => floodIds.contains(r._1))
    // every flood doc resolves to the same canonical: the min flood id
    assert(inFlood.nonEmpty)
    assert(inFlood.map(_._2).distinct.length == 1)
    assert(inFlood.map(_._2).head == floodIds.min)
    assert(inFlood.count(_._3 == 1) == 1, "exactly one keeper in the flood")
  }
}
