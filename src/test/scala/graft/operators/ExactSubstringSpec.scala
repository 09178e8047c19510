package graft.operators

import graft.TestSpark
import graft.functions.SharedSpan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q128 exact-substring dedup: fused SharedSpan kernel goldens plus the
  * winnow→candidate-join→verify dataflow on constructed shared-span
  * fixtures (the positive path the gate corpus only exercises
  * statistically).
  */
class ExactSubstringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def span(n: Int, prefix: String = "s"): Seq[String] =
    (1 to n).map(i => s"$prefix$i")
  private def words(s: Seq[String]): String = s.mkString(" ")

  private def shared(a: String, b: String, k: Int): Boolean =
    Seq((a, b)).toDF("a", "b")
      .select(SharedSpan.sharedSpan($"a", $"b", k).as("r"))
      .head().getBoolean(0)

  test("kernel: exact k-token shared run detected, k-1 rejected") {
    val s = span(50)
    val a = words(span(30, "ja") ++ s ++ span(20, "jb"))
    val b = words(span(5, "jc") ++ s ++ span(40, "jd"))
    assert(shared(a, b, 50))
    // only the first 49 span tokens shared: below threshold
    val b49 = words(span(5, "jc") ++ s.take(49) ++ span(40, "jd"))
    assert(!shared(a, b49, 50))
  }

  test("kernel: position-independent, case-normalized, short-doc safe") {
    val s = span(50)
    // span at the very start of one doc, very end of the other
    assert(shared(words(s ++ span(25, "x")), words(span(60, "y") ++ s), 50))
    // tokenization is lowercased: case differences don't break the match
    assert(shared(words(s).toUpperCase, words(s), 50))
    // identical docs shorter than k can never share a k-run
    assert(!shared(words(span(49)), words(span(49)), 50))
    assert(!shared("", "", 50))
    // small-k golden: abc shared run of 3 inside different contexts
    assert(shared("p q a b c r", "z a b c w v", 3))
    assert(!shared("p q a b x r", "z a b c w v", 3))
  }

  test("kernel: repeated tokens and overlapping near-misses stay exact") {
    // B contains every token of A's run but never 3 contiguously
    assert(!shared("a b c d e", "a b x c d y b c", 3))
    // self-repetitive text: run assembled across a repeat boundary
    assert(shared("a a a a", "x a a a y", 3))
  }

  test("dataflow: planted 50-token span flagged on the LATER doc, earliest wins") {
    val s = span(50)
    val docs = Seq(
      // 1 = origin; 2 and 4 embed the full span at different positions
      (1L, words(span(10, "ja") ++ s ++ span(10, "jb"))),
      (2L, words(span(30, "jc") ++ s)),
      // 3 shares only 49 tokens of the span: must NOT be flagged
      (3L, words(span(30, "jd") ++ s.take(49) ++ span(5, "je"))),
      (4L, words(s ++ span(55, "jf"))),
      // 5 = unrelated long doc
      (5L, words(span(90, "jg")))
    ).toDF("doc_id", "text")
    val r = DedupQueries.exactSubstringFlags(docs)
      .select($"doc_id", $"is_exact_dup", $"dup_of")
      .as[(Long, Int, Long)].collect()
      .map { case (k, f, d) => k -> ((f, d)) }.toMap
    assert(r(1L) == ((0, -1L)), "origin doc must not be flagged")
    assert(r(2L) == ((1, 1L)))
    assert(r(3L) == ((0, -1L)), "49-token overlap is below threshold")
    assert(r(4L) == ((1, 1L)), "dup_of must be the EARLIEST sharer")
    assert(r(5L) == ((0, -1L)))
  }

  test("dataflow: winnow candidates have no false negatives at the 50 boundary") {
    // spans of exactly 50, 51 and 60 tokens at varying offsets — each
    // must be caught (the k+w-1 winnowing guarantee is tight at 50)
    val cases = Seq((50, 0, 7), (51, 13, 2), (60, 25, 30))
    val docs = cases.zipWithIndex.flatMap { case ((n, offA, offB), i) =>
      val s = span(n, s"sp$i")
      Seq((i * 2 + 1L, words(span(offA, s"a$i") ++ s ++ span(6, s"c$i"))),
        (i * 2 + 2L, words(span(offB, s"b$i") ++ s ++ span(9, s"d$i"))))
    }.toDF("doc_id", "text")
    val r = DedupQueries.exactSubstringFlags(docs)
      .filter($"is_exact_dup" === 1)
      .select($"doc_id", $"dup_of").as[(Long, Long)].collect().toSet
    assert(r == Set((2L, 1L), (4L, 3L), (6L, 5L)), r.toString)
  }

  test("coverage kernel: exact span counts, overlap collapse, multi-partner union") {
    import graft.functions.SharedCoverage.sharedCoverage
    val s = span(60)
    def cover(text: String, partners: Seq[String], k: Int = 50): Long =
      Seq((text, partners)).toDF("t", "p")
        .select(sharedCoverage($"t", $"p", k).as("c")).head().getLong(0)
    // a shared run of exactly 60 tokens covers 60 positions
    val doc = words(span(10, "x") ++ s ++ span(5, "y"))
    assert(cover(doc, Seq(words(span(3, "z") ++ s ++ span(8, "w")))) == 60L)
    // run of exactly 50 covers 50; 49 covers 0
    assert(cover(doc, Seq(words(s.take(50)))) == 50L)
    assert(cover(doc, Seq(words(s.take(49)))) == 0L)
    // two partners covering different halves union in the mask: the
    // doc's 60-run via first 50 and last 50 from different partners —
    // union = all 60, counted once
    assert(cover(doc, Seq(words(s.take(50)), words(s.drop(10)))) == 60L)
    // no partners / short doc / null-free edge
    assert(cover(doc, Seq.empty) == 0L)
    assert(cover(words(span(49)), Seq(words(span(49)))) == 0L)
  }

  test("dataflow: strip accounting counts only tokens inside earlier-shared spans") {
    val s = span(55)
    val docs = Seq(
      (1L, words(span(10, "a") ++ s ++ span(10, "b"))), // origin: 0 dup
      (2L, words(span(7, "c") ++ s ++ span(3, "d"))),   // 55 dup of 65
      (3L, words(span(70, "e")))                        // untouched
    ).toDF("doc_id", "text")
    val r = DedupQueries.exactSubstringStrip(docs)
      .select($"doc_id", $"n_tokens", $"n_dup_tokens", $"n_kept")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((75L, 0L, 75L)), s"origin must count 0 dup: $r")
    assert(r(2L) == ((65L, 55L, 10L)), r.toString)
    assert(r(3L) == ((70L, 0L, 70L)), r.toString)
  }

  test("hot-fingerprint cap bounds the candidate join; unique pairs keep full recall") {
    // 12 docs are VERBATIM copies of the same 70-token boilerplate run
    // (identical docs select identical winnowed fingerprints, so every
    // one has document frequency 12), so the uncapped candidate join
    // emits all 12·11/2 = 66 pairs — the O(m²) hot-fingerprint blowup.
    // Two more docs (100, 101) share a 70-token run UNIQUE to them
    // behind differing prefixes (df = 2). NOTE a deliberately weaker
    // variant was tried first — hot docs with unique PREFIXES — and it
    // shows why the cap is on SELECTED-fingerprint frequency: window
    // minima near the prefix/run boundary are context-dependent, so a
    // few interior fingerprints were selected by only 3 of the 12 docs
    // (df = 3 ≤ cap → kept → 3 residual pairs). That is the documented
    // semantics, not a bug: each kept fingerprint still contributes
    // ≤ cap·(cap−1)/2 pairs, which is the bound the cap promises.
    val boiler = span(70, "hot")
    val unique = span(70, "uniq")
    val docs = ((1 to 12).map(d => (d.toLong, words(boiler))) ++ Seq(
        (100L, words(span(10, "qa") ++ unique)),
        (101L, words(span(10, "qb") ++ unique))))
      .toDF("doc_id", "text")
    val uncapped = DedupQueries.spanCandidates(docs)
      .as[(Long, Long)].collect().toSet
    val capped = DedupQueries.spanCandidates(docs, maxDocsPerFingerprint = 5)
      .as[(Long, Long)].collect().toSet
    // uncapped: the full quadratic pair set plus the unique pair
    assert(uncapped.size >= 67 && uncapped.contains((100L, 101L)),
      s"${uncapped.size} pairs: $uncapped")
    // capped: every df>5 fingerprint dropped — the 66 boilerplate pairs
    // are gone (the documented recall loss: corpus-wide boilerplate is
    // q99/q123 strip territory) and the bound holds with room to spare
    assert(capped == Set((100L, 101L)), s"capped: $capped")
    // the unique pair's recall survives END-TO-END through the verify
    // stage, and first-wins accounting is unchanged for it
    val flags = DedupQueries
      .exactSubstringFlags(docs, maxDocsPerFingerprint = 5)
      .select($"doc_id", $"is_exact_dup", $"dup_of")
      .as[(Long, Int, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(flags(101L) == ((1, 100L)), flags.toString)
    assert(flags(100L) == ((0, -1L)), flags.toString)
    assert((1 to 12).forall(d => flags(d.toLong) == ((0, -1L))),
      s"boilerplate docs must be (deliberately) unflagged under the cap: $flags")
  }
}
