package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("byHash: partition-layout independent, total, roughly proportioned") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = docs.select($"doc_id",
      DataSplit.byHash($"doc_id").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = docs.repartition(13).select($"doc_id",
      DataSplit.byHash($"doc_id").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08, frac)
    assert(frac.values.sum == 1.0)
  }

  test("byHash: membership is stable when new rows arrive") {
    val docs = Tables.load(spark, sfDir, "documents")
    val before = docs.filter($"doc_id" < 100)
      .select($"doc_id", DataSplit.byHash($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap
    val after = docs // superset
      .select($"doc_id", DataSplit.byHash($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap
    before.foreach { case (id, s) => assert(after(id) == s) }
  }

  test("stratified sample: exactly k per class, deterministic") {
    val q = DataSplit.all.find(_.name == "q46_stratified_sample").get
    val got = q.run(spark, sfDir).collect()
    val perLabel = got.groupBy(_.getAs[Int]("label"))
    perLabel.values.foreach(rows => assert(rows.length == 5))
    val again = q.run(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(again == got.map(_.toSeq).toSeq)
  }
}
