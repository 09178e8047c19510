package graft.functions

import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.functions.lit
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests for the round-10 scalar kernels (SharedSpan,
  * SharedCoverage, BpeApply) against brute-force references — pure JVM
  * functions, full ScalaCheck volume, no Spark jobs. The kernels use
  * rolling hashes and in-place merge passes; the references use the
  * O(n²) definitions, so any off-by-one, overlap, or hash-roll bug in
  * the fast paths diverges here long before it could reach a corpus.
  */
object Round10Props extends Properties("Round10Functions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(300).withWorkers(1)

  // tiny alphabets force collisions, repeats, and overlapping runs —
  // the regimes where rolling-hash/mask bugs live
  private val tokGen: Gen[String] = Gen.oneOf("a", "b", "c", "ab")
  private val docGen: Gen[String] =
    Gen.listOf(tokGen).map(_.mkString(" "))
  private val kGen: Gen[Int] = Gen.choose(1, 4)

  // reference: any common k-window by direct comparison
  private def refShared(a: String, b: String, k: Int): Boolean = {
    val ta = a.toLowerCase.trim.split("\\s+")
    val tb = b.toLowerCase.trim.split("\\s+")
    (0 to ta.length - k).exists { i =>
      (0 to tb.length - k).exists { j =>
        (0 until k).forall(x => ta(i + x) == tb(j + x))
      }
    }
  }

  // reference: positions of `text` covered by a k-window shared with
  // any partner, by direct comparison
  private def refCoverage(text: String, partners: Seq[String], k: Int): Long = {
    val tb = text.toLowerCase.trim.split("\\s+")
    val covered = Array.fill(tb.length)(false)
    for (p <- partners) {
      val ta = p.toLowerCase.trim.split("\\s+")
      for (j <- 0 to tb.length - k; i <- 0 to ta.length - k)
        if ((0 until k).forall(x => ta(i + x) == tb(j + x)))
          (j until j + k).foreach(covered(_) = true)
    }
    covered.count(identity).toLong
  }

  private def spanExpr(k: Int) =
    SharedSpan(ColumnInterop.expression(lit("x")),
      ColumnInterop.expression(lit("y")), k)

  property("SharedSpan equals the brute-force common-k-window check") =
    forAll(docGen, docGen, kGen) { (a, b, k) =>
      spanExpr(k).compute(UTF8String.fromString(a),
        UTF8String.fromString(b)) == refShared(a, b, k)
    }

  property("SharedSpan is symmetric") =
    forAll(docGen, docGen, kGen) { (a, b, k) =>
      val e = spanExpr(k)
      e.compute(UTF8String.fromString(a), UTF8String.fromString(b)) ==
        e.compute(UTF8String.fromString(b), UTF8String.fromString(a))
    }

  property("SharedCoverage equals the brute-force coverage mask") =
    forAll(docGen, Gen.listOfN(2, docGen), kGen) { (t, ps, k) =>
      val e = SharedCoverage(ColumnInterop.expression(lit("x")),
        ColumnInterop.expression(lit("y")), k)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ps.map(p => UTF8String.fromString(p): Any).toArray)
      e.compute(UTF8String.fromString(t), arr) == refCoverage(t, ps, k)
    }

  // reference BPE application: per merge, repeated left-to-right scan
  // building the output list (the direct transcription of the spec)
  private def refApply(word: String, merges: Seq[(String, String)]): Int = {
    var syms = word.map(_.toString).toList
    for ((a, b) <- merges) {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var rest = syms
      while (rest.nonEmpty) rest match {
        case x :: y :: tail if x == a && y == b =>
          out += (a + b); rest = tail
        case x :: tail => out += x; rest = tail
        case Nil =>
      }
      syms = out.toList
    }
    syms.length
  }

  private val mergeGen: Gen[Seq[(String, String)]] =
    Gen.listOfN(3, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c")))

  property("BpeApply.applyWord equals the reference sequential merger") =
    forAll(Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString), mergeGen) {
      (word, merges) =>
        BpeApply(ColumnInterop.expression(lit("x")), merges)
          .applyWord(word) == refApply(word, merges)
    }

  // ------------------------------------------------------------------
  // The winnowing guarantee q128/q132 candidate recall rests on
  // (Schleimer-Wilkerson-Aiken 2003): two documents sharing a
  // contiguous run of ≥ k+w-1 tokens share at least one selected
  // fingerprint. Property-pinned by PLANTING a shared run of exactly
  // the threshold length inside otherwise-disjoint random contexts —
  // the tight case; a one-token-shorter plant is allowed to miss.

  private def fps(doc: String, k: Int, w: Int): Set[String] = {
    val arr = WinnowFingerprints(ColumnInterop.expression(lit("x")), k, w)
      .compute(UTF8String.fromString(doc))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString).toSet
  }

  private val ctxGen: Gen[List[String]] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf("x", "y", "z")))

  property("winnowing guarantee: a planted k+w-1 run always shares a fingerprint") =
    forAll(ctxGen, ctxGen, ctxGen, ctxGen,
        Gen.choose(2, 4), Gen.choose(2, 5)) { (p1, s1, p2, s2, k, w) =>
      // the planted run uses its own alphabet so the contexts cannot
      // accidentally extend or duplicate it
      val run = (1 to (k + w - 1)).map(i => s"r$i")
      val a = (p1.map(_ + "1") ++ run ++ s1.map(_ + "1")).mkString(" ")
      val b = (p2.map(_ + "2") ++ run ++ s2.map(_ + "2")).mkString(" ")
      fps(a, k, w).intersect(fps(b, k, w)).nonEmpty
    }
}
