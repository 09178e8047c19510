package graft.functions

import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.functions.lit
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pin for q133's exactness argument: applying a TRAINED merge
  * table once-per-merge in RANK order (what the fused [[BpeApply]]
  * kernel does) equals the reference greedy `apply_bpe` loop (always
  * merge the lowest-rank pair present, all occurrences left-to-right,
  * repeat) — on UNIQUE-OUTPUT trained tables: each merge pairs symbols
  * already available AND its concatenated output string is new to the
  * pool. The structural argument: with unique outputs, every symbol
  * string has exactly ONE creating merge, whose rank precedes any
  * merge referencing it, so by the time rank r runs every occurrence
  * greedy would ever merge is already present.
  *
  * BOTH restrictions are essential, and ScalaCheck found the second
  * one (round 11, seed dagvYY7…): the original property omitted the
  * unique-output requirement and was falsified after 338 passes.
  * Distinct merges CAN concatenate to the same string — (b,bb) at an
  * early rank and (bb,b) at a late rank both output "bbb" — giving
  * the symbol a SECOND, later creation path: on "abbb", greedy merges
  * (b,b)→a·bb·b, then (bb,b)→a·bbb, then revisits the earlier-rank
  * (a,bbb)→1 symbol, while the single rank-ordered pass ran (a,bbb)
  * before any "bbb" existed and stops at 2. The first restriction
  * (availability) fails similarly: rank 1 = (x,ab) before rank 2 =
  * (a,b) creates "ab". The boundary regression below pins the
  * duplicate-output divergence deterministically; q133's ACTUAL
  * q131-trained tables are unique-output (TrainingSpec checks the
  * gate corpora), so the kernel is exact apply_bpe where the registry
  * runs it, and the DEFINED oracle-replayed semantics everywhere.
  * Pure JVM, full ScalaCheck volume, no Spark jobs.
  */
object Round11Props extends Properties("Round11Functions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500).withWorkers(1)

  private val alphabet = Vector("a", "b", "c")

  /** Unique-output trained-valid merge table: start from the alphabet
    * pool; each merge picks two symbols ALREADY in the pool (indices
    * into it) and its output joins the pool. Duplicate pairs are
    * dropped (training never re-selects a merged pair), and so are
    * merges whose concatenated OUTPUT string already names a pool
    * symbol — the unique-creation invariant the equivalence proof
    * needs (see the object scaladoc for the counterexample without
    * it).
    */
  private val trainedTableGen: Gen[Seq[(String, String)]] =
    for {
      n <- Gen.choose(0, 8)
      picks <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 100), Gen.choose(0, 100)))
    } yield {
      val pool = scala.collection.mutable.ArrayBuffer(alphabet: _*)
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      for ((i, j) <- picks) {
        val a = pool(i % pool.length)
        val b = pool(j % pool.length)
        if (!merges.contains((a, b)) && !pool.contains(a + b)) {
          merges += ((a, b))
          pool += a + b
        }
      }
      merges.toSeq
    }

  private val wordGen: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "b", "c")).map(_.mkString)

  /** Reference greedy apply_bpe: repeatedly merge the lowest-rank pair
    * present (all occurrences, left-to-right), until no table pair
    * remains in the word.
    */
  private def greedyApply(word: String, merges: Seq[(String, String)]): Int = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var done = syms.length <= 1
    while (!done) {
      val present = syms.indices.dropRight(1)
        .map(i => (syms(i), syms(i + 1)))
        .distinct.flatMap(p => rank.get(p).map(p -> _))
      if (present.isEmpty) done = true
      else {
        val (best, _) = present.minBy(_._2)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
            out += syms(i) + syms(i + 1)
            i += 2
          } else {
            out += syms(i)
            i += 1
          }
        }
        syms = out.result()
        done = syms.length <= 1
      }
    }
    syms.length
  }

  property("rank-order single-pass == greedy min-rank apply_bpe on unique-output trained tables") =
    forAll(trainedTableGen, wordGen) { (merges, word) =>
      val kernel = BpeApply(ColumnInterop.expression(lit("x")), merges)
      word.isEmpty || kernel.applyWord(word) == greedyApply(word, merges)
    }

  property("duplicate-output tables sit OUTSIDE the guarantee (scoping is tight)") = {
    // ScalaCheck's round-11 counterexample, pinned deterministically:
    // "bbb" is created at rank 1 by (b,bb) AND at rank 4 by (bb,b), so
    // greedy reaches the rank-3 pair (a,bbb) only AFTER rank 4 runs —
    // a single rank-ordered pass cannot revisit it. Single-pass is the
    // DEFINED (oracle-replayed) semantics; this pin documents that the
    // unique-output restriction above is necessary, not cosmetic.
    val merges = Seq(("b", "b"), ("b", "bb"), ("bb", "c"),
      ("a", "bbb"), ("bb", "b"))
    val kernel = BpeApply(ColumnInterop.expression(lit("x")), merges)
    val word = "abbb"
    kernel.applyWord(word) == 2 && greedyApply(word, merges) == 1
  }
}
