package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Misra-Gries guarantee under Spark's partial-aggregation merge
  * tree, exercised with k SMALLER than the vocabulary so the
  * decrement/truncate paths actually run (on the testdata corpus the
  * ~40-word vocabulary fits entirely in q86's k=64, which would leave
  * the guarantee untested).
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // zipf-ish synthetic stream: word i appears ~N/i times
  private def corpus(n: Int): Seq[String] =
    (1 to 30).flatMap(i => Seq.fill(n / i)(s"w$i"))

  test("every key above n/(k+1) survives any partitioning; size <= k") {
    val k = 4
    val data = corpus(3000)
    val n = data.size.toLong
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val guaranteed = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(guaranteed.nonEmpty && guaranteed.size <= k)
    for (parts <- Seq(1, 7, 32)) {
      val sketch = data.toDF("word").repartition(parts)
        .agg(FreqSketch.freqSketch($"word", k).as("mg"))
        .collect()(0).getMap[String, Long](0).toMap
      assert(sketch.size <= k, s"parts=$parts: ${sketch.size} > k")
      assert(guaranteed.subsetOf(sketch.keySet),
        s"parts=$parts: missing ${guaranteed -- sketch.keySet}")
      // stored counts never overestimate, undercount bounded by n/(k+1)
      sketch.foreach { case (w, c) =>
        assert(c <= exact(w), s"$w overcounted: $c > ${exact(w)}")
        assert(exact(w) - c <= n / (k + 1) + 1,
          s"$w undercount ${exact(w) - c} above bound")
      }
    }
  }

  test("q86 end result is partition-count independent (exact recount)") {
    val r1 = graft.SparkEntry.queries("q86_heavy_hitters")(
      spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSeq
    val r2 = graft.SparkEntry.queries("q86_heavy_hitters")(
      spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSeq
    assert(r1.nonEmpty && r1 == r2)
    // independent exact recompute of the same threshold set
    val words = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(split(lower(trim($"text")), "\\s+")).as("word"))
    val n = words.count()
    val expect = words.groupBy($"word").count()
      .filter($"count" * 65 > n)
      .select($"word", $"count".as("cnt"))
      .as[(String, Long)].collect().toMap
    val got = r1.map(r => r.head.asInstanceOf[String] ->
      r(1).asInstanceOf[Long]).toMap
    assert(got == expect)
  }
}
