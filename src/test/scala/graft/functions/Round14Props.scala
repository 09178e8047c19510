package graft.functions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for the round-14 weighted bottom-k kernel — the
  * structural claim q151 rests on, checked at ScalaCheck volume. Pure
  * JVM, no Spark jobs.
  *
  * Fold + merge over ANY partitioning of the input, merged in ANY
  * order, equals the weighted k-smallest of the whole multiset — the
  * lexicographic (key, value, weight) take-k with duplicates kept. This
  * is the multiset-pure-function property that lets the sketch sit
  * under the cross-engine hash gate (DuckDB rebuilds the same sample
  * with `row_number() OVER (ORDER BY key, value, weight) <= k`).
  */
object Round14Props extends Properties("Round14Functions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500).withWorkers(1)

  // small domains force key/value/weight collisions so the tie paths
  // (insert-after-equals, k-boundary runs of ties) are exercised hard
  private val tripleGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(60, for {
      k <- Gen.chooseNum(0L, 25L)
      v <- Gen.chooseNum(0L, 8L)
      w <- Gen.chooseNum(1L, 5L)
    } yield (k, v, w))

  private def foldOf(xs: Seq[(Long, Long, Long)], k: Int): Array[Long] = {
    val agg = new WeightedBottomK.Agg(k)
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
  }

  private def lexTakeK(xs: Seq[(Long, Long, Long)], k: Int): Seq[Long] =
    xs.sorted.take(k).flatMap(t => Seq(t._1, t._2, t._3))

  property("fold+merge over any partitioning/merge order == weighted k-smallest of the multiset") =
    forAll(tripleGen, Gen.chooseNum(1, 12), Gen.chooseNum(1, 5),
        Gen.chooseNum(0L, 1000L)) { (xs, k, nParts, seed) =>
      val rnd = new scala.util.Random(seed)
      val parts = xs.groupBy(_ => rnd.nextInt(nParts)).values.toList
      val agg = new WeightedBottomK.Agg(k)
      val partials = parts.map(p => foldOf(p, k))
      val merged = rnd.shuffle(partials)
        .foldLeft(agg.zero)((b, sk) => agg.merge(b, sk))
      merged.toList == lexTakeK(xs, k).toList
    }

  property("sentinel keys (< 0) never enter the sample") =
    forAll(tripleGen, Gen.chooseNum(1, 12)) { (xs, k) =>
      val withSentinels = xs.flatMap(t => List(t, (-1L, t._2, t._3)))
      foldOf(withSentinels, k).toList == lexTakeK(xs, k).toList
    }

  property("finish emits (value, weight) pairs sorted by (value, weight)") =
    forAll(tripleGen, Gen.chooseNum(1, 12)) { (xs, k) =>
      val agg = new WeightedBottomK.Agg(k)
      val pairs = agg.finish(foldOf(xs, k)).toList
      val expect = xs.sorted.take(k).map(t => (t._2, t._3)).sorted
      pairs == expect
    }
}
