package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV's load-bearing property is DETERMINISM under Spark's merge tree:
  * the sketch state must be a pure function of the input SET so the
  * DuckDB oracle can recompute it relationally (q88). Accuracy is
  * secondary (and only statistical), but the estimator should still land
  * within the ~1/√(k−2) relative-error band on uniform hashes.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hashes(n: Int): Seq[Long] =
    (1L to n.toLong).map(i =>
      MulMod61.affine(KmvSketch.kmvA, KmvSketch.kmvB, i))

  test("sketch equals the k smallest distinct hashes, any partitioning") {
    val k = 16
    val data = hashes(500) ++ hashes(250) // duplicates must not matter
    val expected = data.distinct.sorted.take(k)
    for (parts <- Seq(1, 7, 32)) {
      val got = data.toDF("h").repartition(parts)
        .agg(KmvSketch.kmvSketch($"h", k).as("kmv"))
        .collect()(0).getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("fewer than k distinct values: sketch is the exact sorted set") {
    val got = hashes(9).toDF("h")
      .agg(KmvSketch.kmvSketch($"h", 32).as("kmv"))
      .collect()(0).getSeq[Long](0)
    assert(got == hashes(9).sorted)
  }

  test("estimator lands within the statistical error band") {
    val k = 64
    val n = 20000
    val arr = hashes(n).toDF("h")
      .agg(KmvSketch.kmvSketch($"h", k).as("kmv"))
      .collect()(0).getSeq[Long](0)
    val est = (k - 1).toDouble * MulMod61.P.toDouble / arr(k - 1).toDouble
    val relErr = math.abs(est - n) / n
    assert(relErr < 4.0 / math.sqrt(k - 2.0), s"est=$est relErr=$relErr")
  }

  test("negative inputs (the null sentinel) are skipped, not counted") {
    val data = hashes(40) ++ Seq(-1L, -1L, -1L)
    val got = data.toDF("h").repartition(5)
      .agg(KmvSketch.kmvSketch($"h", 16).as("kmv"))
      .collect()(0).getSeq[Long](0)
    assert(got == hashes(40).distinct.sorted.take(16))
    // a sketch fed ONLY sentinels is empty (distinct non-null = 0)
    val empty = Seq(-1L).toDF("h")
      .agg(KmvSketch.kmvSketch($"h", 16).as("kmv"))
      .collect()(0).getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("reduce keeps the buffer sorted, distinct, and capped at k") {
    val agg = new KmvSketch.Agg(4)
    val rnd = new scala.util.Random(11)
    var buf = agg.zero
    val seen = scala.collection.mutable.Set[Long]()
    for (_ <- 1 to 500) {
      val x = rnd.nextInt(40).toLong
      seen += x
      buf = agg.reduce(buf, x)
      assert(buf.length <= 4)
      assert(buf.toSeq == buf.toSeq.distinct.sorted)
      assert(buf.toSeq == seen.toSeq.sorted.take(4))
    }
  }
}
