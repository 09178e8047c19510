package graft.sources

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout contracts: partition pruning is visible in the plan AND in
  * the files actually touched; clustered files cover disjoint key
  * ranges; compaction shrinks file counts without changing data.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def tmp() = Files.createTempDirectory("graft_layout").toString

  test("partitioned write: filters prune directories, not just rows") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = s"${tmp()}/docs_by_lang"
    Layout.writePartitioned(docs, dir, Seq("lang"))

    val back = spark.read.parquet(dir)
    val q = back.filter($"lang" === "fr")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      plan.take(500))
    // the scan touches ONLY the lang=fr directory
    val touched = q.select(input_file_name()).distinct().as[String].collect()
    assert(touched.nonEmpty && touched.forall(_.contains("lang=fr")), touched.toSeq)
    // and the data round-trips
    assert(q.count() == docs.filter($"lang" === "fr").count())
  }

  test("clustered write: files cover disjoint doc_id ranges") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = s"${tmp()}/docs_clustered"
    Layout.writeClustered(docs, dir, "doc_id", numFiles = 8)

    val ranges = spark.read.parquet(dir)
      .select(input_file_name().as("f"), $"doc_id")
      .groupBy($"f")
      .agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
      .orderBy($"lo")
      .as[(String, Long, Long)].collect()
    assert(ranges.length == 8)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2, ranges.toSeq)
      case _ =>
    }
    assert(spark.read.parquet(dir).count() == docs.count())
  }

  test("compact: shrinks a small-file table, data unchanged") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = s"${tmp()}/docs_sprawl"
    docs.repartition(64).write.parquet(dir)
    def nFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(nFiles == 64)

    val before = spark.read.parquet(dir).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val n = Layout.compact(spark, dir, targetFileBytes = 1L << 20)
    assert(n < 64 && nFiles == n, s"n=$n files=$nFiles")
    val after = spark.read.parquet(dir).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(after == before)
  }
}
