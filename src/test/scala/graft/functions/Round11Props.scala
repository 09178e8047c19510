package graft.functions

import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.functions.lit
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pin for q133's exactness argument: applying a TRAINED merge
  * table once-per-merge in RANK order (what the fused [[BpeApply]]
  * kernel does) equals the reference greedy `apply_bpe` loop (always
  * merge the lowest-rank pair present, all occurrences left-to-right,
  * repeat). The argument in q133's scaladoc is structural — any
  * multi-char symbol a merge references was created by an earlier-rank
  * merge, and merging never deletes symbols, so a later merge can never
  * create a new occurrence of an earlier pair — and this property
  * checks it mechanically over random TRAINED-VALID tables (built the
  * way training builds them: each merge pairs symbols already
  * available, its output joining the pool) and random words, including
  * the self-overlapping runs where left-to-right tie-breaking matters.
  * NOTE the restriction to trained-valid tables is essential: for an
  * ARBITRARY table the two strategies genuinely differ — rank 1 =
  * (x,ab), rank 2 = (a,b) references symbol "ab" before any rank
  * creates it; on "xab" rank-order gives x,(ab) = 2 symbols (rank 1
  * finds no (x,ab) pair when it runs, rank 2 then creates one too
  * late), while greedy re-scans after merging (a,b), finds (x,ab), and
  * reaches 1 symbol. Pure JVM, full ScalaCheck volume, no Spark jobs.
  */
object Round11Props extends Properties("Round11Functions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500).withWorkers(1)

  private val alphabet = Vector("a", "b", "c")

  /** Trained-valid merge table: start from the alphabet pool; each merge
    * picks two symbols ALREADY in the pool (indices into it) and its
    * output joins the pool — exactly the invariant a real training run
    * maintains. Duplicate pairs are dropped (training never re-selects
    * a merged pair: its occurrences were consumed when it won).
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
        if (!merges.contains((a, b))) {
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

  property("rank-order single-pass == greedy min-rank apply_bpe on trained-valid tables") =
    forAll(trainedTableGen, wordGen) { (merges, word) =>
      val kernel = BpeApply(ColumnInterop.expression(lit("x")), merges)
      word.isEmpty || kernel.applyWord(word) == greedyApply(word, merges)
    }
}
