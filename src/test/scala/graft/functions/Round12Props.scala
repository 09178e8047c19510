package graft.functions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for the round-12 sketch kernels — the structural
  * claims their estimators rest on, checked at ScalaCheck volume.
  * Pure JVM, no Spark jobs.
  *
  * 1. [[BottomK.Agg]] is a correct mergeable bottom-k over pair
  *    MULTISETS: any partitioning of the input, folded per partition
  *    and merged in any order, equals the k smallest (h, v) pairs of
  *    the whole multiset (duplicates kept) with values emitted sorted.
  *    This is the multiset-purity that lets q141 sit under the exact
  *    cross-engine hash gate.
  *
  * 2. The q144 membership lemma: for any sets A, B and any h among the
  *    k smallest of (kmin_k(A) ∪ kmin_k(B)), membership of h in the
  *    SKETCH equals membership in the SET — and the k smallest of the
  *    sketch union ARE the k smallest of A ∪ B. This is what makes the
  *    intersection/difference fractions exact Bernoulli averages
  *    rather than sketch-of-sketch approximations.
  */
object Round12Props extends Properties("Round12Functions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500).withWorkers(1)

  private val pairGen: Gen[(Long, Long)] = for {
    h <- Gen.chooseNum(0L, 40L) // tight domain: force duplicates + ties
    v <- Gen.chooseNum(-5L, 5L)
  } yield (h, v)

  private val inputGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, pairGen).flatMap(l => Gen.someOf(l).map(_.toList))

  /** Reference: k smallest pairs of the multiset, values sorted. */
  private def refBottomK(xs: List[(Long, Long)], k: Int): List[Long] =
    xs.sorted.take(k).map(_._2).sorted

  property("bottom-k fold+merge == multiset k-smallest, any partitioning/merge order") =
    forAll(inputGen, Gen.chooseNum(1, 12), Gen.chooseNum(1, 5),
        Gen.chooseNum(0L, 1000L)) { (xs, k, nParts, seed) =>
      val agg = new BottomK.Agg(k)
      val rnd = new scala.util.Random(seed)
      // random partitioning
      val parts = xs.groupBy(_ => rnd.nextInt(nParts)).values.toList
      val partials = parts.map(p =>
        p.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
      // merge in a random order
      val shuffled = rnd.shuffle(partials)
      val merged = shuffled.foldLeft(agg.zero)((a, b) => agg.merge(a, b))
      agg.finish(merged).toList == refBottomK(xs, k)
    }

  property("bottom-k merge is commutative") =
    forAll(inputGen, inputGen, Gen.chooseNum(1, 8)) { (xs, ys, k) =>
      val agg = new BottomK.Agg(k)
      val a = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      val b = ys.foldLeft(agg.zero)((bb, x) => agg.reduce(bb, x))
      agg.merge(a.clone(), b.clone()).toList ==
        agg.merge(b.clone(), a.clone()).toList
    }

  private val setGen: Gen[Set[Long]] =
    Gen.listOfN(40, Gen.chooseNum(0L, 120L)).map(_.toSet)

  property("q144 lemma: union-k-min of sketches == union-k-min of sets; sketch membership exact there") =
    forAll(setGen, setGen, Gen.chooseNum(1, 16)) { (a, b, k) =>
      val skA = a.toList.sorted.take(k).toSet
      val skB = b.toList.sorted.take(k).toSet
      val unionKofSketches = (skA ++ skB).toList.sorted.take(k)
      val unionKofSets = (a ++ b).toList.sorted.take(k)
      unionKofSketches == unionKofSets &&
        unionKofSketches.forall(h =>
          skA.contains(h) == a.contains(h) && skB.contains(h) == b.contains(h))
    }
}
