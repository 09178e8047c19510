package graft.functions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for the round-13 sketch-store kernels — the structural
  * claims the persisted tier rests on, checked at ScalaCheck volume.
  * Pure JVM, no Spark jobs.
  *
  * 1. [[KmvSketch.MergeAgg]] is a correct second-level fold: merging
  *    ALREADY-BUILT k-min sketches of any partitioning of a set, in any
  *    merge order, equals the k-min sketch of the whole set. This is
  *    the closure-under-union that lets SketchStore roll per-day kmv
  *    state up to any grain without touching raw keys (Beyer et al.
  *    SIGMOD'07 §5).
  *
  * 2. Absorb idempotence: merging a sketch with itself — the
  *    at-least-once redelivery shape — is the identity. Together with
  *    property 1 this is why the store needs no batch-id bookkeeping.
  *
  * 3. Sketch-of-sketches degradation bound does NOT apply: building a
  *    k-min over a SUBSET's sketch loses nothing below the global
  *    h₍ₖ₎ — the k smallest of merged partials are exactly the k
  *    smallest of the union (restated from the q144 lemma at the
  *    MergeAgg level, where the store actually exercises it).
  */
object Round13Props extends Properties("Round13Functions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500).withWorkers(1)

  private val setGen: Gen[List[Long]] =
    Gen.listOfN(50, Gen.chooseNum(0L, 150L))

  /** Build a row-level sketch with the first-level aggregator. */
  private def sketchOf(xs: Seq[Long], k: Int): Array[Long] = {
    val agg = new KmvSketch.Agg(k)
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
  }

  property("MergeAgg over partition sketches == sketch of the union, any partitioning/merge order") =
    forAll(setGen, Gen.chooseNum(1, 12), Gen.chooseNum(1, 5),
        Gen.chooseNum(0L, 1000L)) { (xs, k, nParts, seed) =>
      val rnd = new scala.util.Random(seed)
      val parts = xs.groupBy(_ => rnd.nextInt(nParts)).values.toList
      val partials = parts.map(p => sketchOf(p, k))
      val m = new KmvSketch.MergeAgg(k)
      val merged = rnd.shuffle(partials)
        .foldLeft(m.zero)((b, sk) => m.reduce(b, sk))
      m.finish(merged).toList == sketchOf(xs, k).toList
    }

  property("MergeAgg merge() and reduce() agree and are commutative") =
    forAll(setGen, setGen, Gen.chooseNum(1, 8)) { (xs, ys, k) =>
      val m = new KmvSketch.MergeAgg(k)
      val a = sketchOf(xs, k)
      val b = sketchOf(ys, k)
      val viaMerge = m.merge(a.clone(), b.clone()).toList
      val viaReduce = m.reduce(m.reduce(m.zero, a), b).toList
      viaMerge == viaReduce &&
        viaMerge == m.merge(b.clone(), a.clone()).toList
    }

  property("absorb idempotence: sketch merged with itself is the identity") =
    forAll(setGen, Gen.chooseNum(1, 10)) { (xs, k) =>
      val m = new KmvSketch.MergeAgg(k)
      val sk = sketchOf(xs, k)
      m.merge(sk.clone(), sk.clone()).toList == sk.toList
    }

  property("null-sentinel rows never enter a sketch at any level") =
    forAll(setGen, Gen.chooseNum(1, 10)) { (xs, k) =>
      val withNulls = xs.flatMap(x => Seq(x, -1L, Long.MinValue))
      sketchOf(withNulls, k).toList == sketchOf(xs, k).toList
    }
}
