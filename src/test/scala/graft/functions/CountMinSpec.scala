package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min's load-bearing property is that the counter matrix is a
  * pure function of the input MULTISET: every cell is a SUM, so row
  * order, partitioning, and the merge tree are all invisible — which is
  * what lets q138 sit under the exact hash-equality oracle gate (DuckDB
  * rebuilds the identical matrix relationally). The estimator's
  * one-sided guarantee (est ≥ true, always) is structural, not
  * statistical, so it is pinned exactly.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a skewed multiset over a small key space: key i appears i² times
  private def keys(n: Int): Seq[Long] =
    (1 to n).flatMap(i => Seq.fill(i * i)(i.toLong))
  private def hashed(n: Int): Seq[Long] =
    keys(n).map(MulMod61.affine(KmvSketch.kmvA, KmvSketch.kmvB, _))

  test("matrix is a pure function of the multiset, any partitioning") {
    val data = hashed(20)
    val expected = {
      val m = new Array[Long](CountMin.D * CountMin.W)
      data.foreach { ph =>
        var i = 0
        while (i < CountMin.D) {
          m(i * CountMin.W + CountMin.cellOf(ph, i)) += 1; i += 1
        }
      }
      m.toSeq
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = data.toDF("h").repartition(parts)
        .agg(CountMin.countMin($"h").as("cms"))
        .collect()(0).getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("each row of the matrix sums to N (no counts lost or invented)") {
    val data = hashed(15)
    val m = data.toDF("h").repartition(9)
      .agg(CountMin.countMin($"h").as("cms"))
      .collect()(0).getSeq[Long](0)
    for (i <- 0 until CountMin.D) {
      val rowSum = m.slice(i * CountMin.W, (i + 1) * CountMin.W).sum
      assert(rowSum == data.length.toLong, s"row=$i")
    }
  }

  test("estimate is one-sided: est >= exact for EVERY key") {
    val n = 40
    val exact = keys(n).groupBy(identity).map { case (k, v) =>
      MulMod61.affine(KmvSketch.kmvA, KmvSketch.kmvB, k) -> v.length.toLong
    }
    val df = hashed(n).toDF("h").repartition(8)
    val sketch = df.agg(CountMin.countMin($"h").as("cms"))
    val got = df.distinct().crossJoin(broadcast(sketch))
      .select($"h", CountMin.estimate($"cms", $"h").as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (ph, est) =>
      assert(est >= exact(ph), s"ph=$ph est=$est exact=${exact(ph)}")
    }
    // total overcount across all keys is bounded by (distinct-1) * N / W
    // per probe in the worst case; with 40 keys vs 1024 cells collisions
    // are rare — pin that MOST estimates are exact (sanity, not theory)
    val exactHits = got.count { case (ph, est) => est == exact(ph) }
    assert(exactHits >= exact.size - 4, s"only $exactHits/${exact.size} exact")
  }

  test("estimate column matches the driver-side min-over-cells replay") {
    val data = hashed(12)
    val m = data.toDF("h").agg(CountMin.countMin($"h").as("cms"))
      .collect()(0).getSeq[Long](0)
    val probes = data.distinct
    val viaCol = probes.toDF("h")
      .crossJoin(broadcast(data.toDF("h").agg(CountMin.countMin($"h").as("cms"))))
      .select($"h", CountMin.estimate($"cms", $"h").as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    probes.foreach { ph =>
      val manual = (0 until CountMin.D)
        .map(i => m(i * CountMin.W + CountMin.cellOf(ph, i))).min
      assert(viaCol(ph) == manual, s"ph=$ph")
    }
  }

  test("negative inputs (the null sentinel) are skipped, not counted") {
    val data = hashed(10) ++ Seq(-1L, -1L)
    val m = data.toDF("h").repartition(5)
      .agg(CountMin.countMin($"h").as("cms"))
      .collect()(0).getSeq[Long](0)
    assert(m.slice(0, CountMin.W).sum == hashed(10).length.toLong)
    // a sketch fed ONLY sentinels is the zero matrix
    val z = Seq(-1L).toDF("h").agg(CountMin.countMin($"h").as("cms"))
      .collect()(0).getSeq[Long](0)
    assert(z.forall(_ == 0L) && z.length == CountMin.D * CountMin.W)
  }

  test("hash family draw order is pinned (oracle contract)") {
    // the a-block precedes the b-block from seed 20261115; a change here
    // silently re-pins every q138 cell on BOTH engines — fail loudly
    val rnd = new java.util.Random(20261115L)
    val a = Array.fill(CountMin.D)((rnd.nextLong() & Long.MaxValue) % (MulMod61.P - 1) + 1)
    val b = Array.fill(CountMin.D)((rnd.nextLong() & Long.MaxValue) % MulMod61.P)
    assert(CountMin.cmsA.toSeq == a.toSeq && CountMin.cmsB.toSeq == b.toSeq)
  }
}
