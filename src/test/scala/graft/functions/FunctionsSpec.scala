package graft.functions

import graft.TestSpark
import graft.functions.PolyHash.polyHash
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("polyHash matches the reference recurrence (golden value)") {
    // h("abc") = (('a'*B)+'b')*B+'c' with B=1000003, over UTF-8 bytes
    val expected = (('a'.toLong * 1000003L + 'b') * 1000003L) + 'c'
    val got = Seq("abc").toDF("t").select(polyHash($"t")).as[Long].head()
    assert(got == expected)
    // rolling property: h(s ++ t) = h(s)*B^|t| + h(t)
    val hs = Seq("ab").toDF("t").select(polyHash($"t")).as[Long].head()
    val ht = Seq("cd").toDF("t").select(polyHash($"t")).as[Long].head()
    val hst = Seq("abcd").toDF("t").select(polyHash($"t")).as[Long].head()
    assert(hst == hs * 1000003L * 1000003L + ht)
  }

  test("polyHash: interpreted eval equals codegen result") {
    val df = Seq("hello world", "", "ünïcødé").toDF("t")
    val viaExpr = df.select(polyHash($"t")).as[Long].collect().toSeq
    // force interpreted path through the same expression
    val interp = df.collect().map { r =>
      val bytes = r.getString(0).getBytes("UTF-8")
      bytes.foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))
    }.toSeq
    assert(viaExpr == interp)
  }

  test("MulMod61: mulmod/affine match arbitrary-precision arithmetic") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val a = math.abs(rnd.nextLong()) % MulMod61.P
      val x = math.abs(rnd.nextLong()) % MulMod61.P
      assert(MulMod61.mulmod(a, x) ==
        (BigInt(a) * BigInt(x) % MulMod61.P).toLong)
      val b = math.abs(rnd.nextLong()) % MulMod61.P
      assert(MulMod61.affine(a, b, x) ==
        ((BigInt(a) * BigInt(x) + b) % MulMod61.P).toLong)
    }
  }

  test("MulMod61: polyHash61 matches the byte-fold reference") {
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- Seq("", "a", "abc def", "the quick brown fox", "x" * 500)) {
      val expected = s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) =>
        (h * MulMod61.B + (b & 0xff)) % MulMod61.P).toLong
      assert(MulMod61.polyHash61(UTF8String.fromString(s)) == expected)
    }
  }

  test("MinHashSig positions are the affine-family minima over shingle hashes") {
    import org.apache.spark.unsafe.types.UTF8String
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val sh = Seq(text).toDF("t")
      .select(shingleSet($"t", 3).as("s")).as[Seq[String]].head()
    val sig = Seq(text).toDF("t")
      .select(MinHashSig.minhashSig(shingleSet($"t", 3), 8).as("sig"))
      .as[Seq[Long]].head()
    val phs = sh.map(x => MulMod61.polyHash61(UTF8String.fromString(x)))
    val expected = (0 until 8).map(i =>
      phs.map(x => MulMod61.affine(MulMod61.ha(i), MulMod61.hb(i), x)).min)
    assert(sig == expected)
  }

  test("PolyHashLongs matches the long-fold reference and feeds band keys") {
    val vs = Seq(5L, MulMod61.P - 1, 123456789012345L, 0L)
    val got = Seq(vs).toDF("v")
      .select(PolyHashLongs.polyHashLongs($"v")).as[Long].head()
    val expected = vs.foldLeft(BigInt(0))((h, v) =>
      (h * MulMod61.B + v) % MulMod61.P).toLong
    assert(got == expected)
  }

  test("IntDot equals the BigInt dot product (codegen + interpreted)") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rnd.nextInt(1001).toLong - 500),
      Seq.fill(64)(rnd.nextInt(2000001).toLong - 1000000)))
    val got = rows.toDF("a", "b")
      .select(IntDot.intDot($"a", $"b")).as[Long].collect().toSeq
    val expected = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum.toLong }
    assert(got == expected)
  }

  test("tokens / shingles") {
    val sh = Seq("a b c d").toDF("t")
      .select(shingleSet($"t", 3)).as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(shingleSet($"t", 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("fused Shingles expression equals the declarative HOF form") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(100)
    val declarative = docs.select($"doc_id",
      array_distinct(shingles($"text", 3)).as("s"))
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    val fused = docs.select($"doc_id", shingleSet($"text", 3).as("s"))
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(fused == declarative)
  }

  test("langId picks the language with most marker hits") {
    val df = Seq(
      "the cat sat on the mat and it is warm",
      "le chat est dans la maison et il est pour",
      "el gato es de la casa y es para todos",
      "zzz qqq xxx").toDF("t")
    val got = df.select(langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "fr", "es", "und"))
  }

  test("quality score is bounded and ordered sensibly") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and this is a fine sentence with many of the usual words in it",
      "!!! ### $$$ %%% ^^^").toDF("t")
    val q = df.select(qualityScore($"t")).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("fused CosineSim is bit-identical to the declarative HOF cosine") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = emb.select($"vec_id", $"embedding")
      .crossJoin(emb.filter($"vec_id" < 5)
        .select($"embedding".as("q_vec")))
    val both = pairs.select(
      CosineSim.cosineFused($"q_vec", $"embedding").as("fused"),
      cosine($"q_vec", $"embedding").as("hof"))
    // bitwise equality, not epsilon: the oracle hash-compare needs it
    val diff = both.filter(!($"fused" <=> $"hof")).count()
    assert(diff == 0)
  }

  test("fused HyperplaneBucket equals the declarative HOF bucket") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val both = emb.select(
      HyperplaneBucket.hyperplaneBucketFused($"embedding", 8, 42).as("fused"),
      hyperplaneBucket($"embedding", 8, 42).as("hof"))
    assert(both.filter($"fused" =!= $"hof").count() == 0)
  }

  test("fused TextStats/LangId equal the declarative HOF forms") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val st = textStats($"text")
    val both = docs.select(
      (st.getField("n_tokens") === tokenCount($"text")).as("tok_eq"),
      (stopwordRatioOf(st) <=> stopwordRatio($"text")).as("stop_eq"),
      (qualityScoreFused($"text", st) <=> qualityScore($"text")).as("q_eq"),
      (langIdFused($"text") === langId($"text")).as("lang_eq"))
    assert(both
      .filter(!$"tok_eq" || !$"stop_eq" || !$"q_eq" || !$"lang_eq")
      .count() == 0)
  }

  test("ByteEntropy matches the reference fold; bounds and edge cases hold") {
    def ref(t: String): Double = {
      val bytes = t.getBytes("UTF-8")
      if (bytes.isEmpty) 0.0
      else {
        val counts = new Array[Int](256)
        bytes.foreach(b => counts(b & 0xff) += 1)
        val n = bytes.length.toDouble
        var s = 0.0
        for (b <- 0 until 256 if counts(b) > 0) {
          val p = counts(b) / n
          s += p * Math.log(p)
        }
        if (s == 0.0) 0.0 else -s
      }
    }
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = docs.select($"text",
      ByteEntropy.byteEntropy($"text").as("e")).collect()
    got.foreach { r =>
      val e = r.getDouble(1)
      assert(java.lang.Double.doubleToLongBits(e) ==
        java.lang.Double.doubleToLongBits(ref(r.getString(0))))
      assert(e > 0 && e <= Math.log(256.0))
    }
    // all-one-symbol input: exactly +0.0, never -0.0 (repr-compare trap)
    val zero = Seq("aaaaaa").toDF("t")
      .select(ByteEntropy.byteEntropy($"t")).as[Double].head()
    assert(java.lang.Double.doubleToLongBits(zero) == 0L)
    // two equiprobable symbols: exactly ln(2) up to the fold's rounding
    val ab = Seq("abab").toDF("t")
      .select(ByteEntropy.byteEntropy($"t")).as[Double].head()
    assert(math.abs(ab - Math.log(2.0)) < 1e-15)
  }

  test("SimHashFeatures over distinct tokens equals SimHash61 on the text") {
    // SimHash61 tokenizes + dedups internally; feeding the same distinct
    // token array through the feature-generic form must reproduce every
    // signature bit (same hash constants, same tie rule)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val both = docs.select(
      SimHashFeatures.simhashFeatures(
        array_distinct(split(lower(trim($"text")), "\\s+"))).as("feat"),
      SimHash61.simhash($"text").as("tok"))
    assert(both.filter($"feat" =!= $"tok").count() == 0)
  }

  test("SimHashFeatures: empty feature array yields the all-ones sentinel") {
    val got = Seq(Seq.empty[String]).toDF("f")
      .select(SimHashFeatures.simhashFeatures($"f")).as[Long].head()
    assert(got == MulMod61.P) // 61 tie-votes, all round up
  }

  test("SimHashFeatures: null array elements are skipped, not a crash") {
    // SQL callers can build containsNull arrays; a null feature is no
    // feature — the signature must equal the null-free array's
    val rows = spark.sql(
      """SELECT simhash_features(array('a b c', CAST(NULL AS STRING), 'd e')) AS withNull,
                simhash_features(array('a b c', 'd e')) AS without""")
      .collect()(0)
    assert(rows.getLong(0) == rows.getLong(1))
  }

  test("fused WinnowFingerprints equals the declarative HOF chain") {
    import org.apache.spark.sql.functions._
    val k = 3; val w = 4
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val tk = split(lower(trim($"text")), "\\s+")
    val sh = when(size(tk) >= k,
      transform(sequence(lit(0), size(tk) - k),
        i => concat_ws(" ", slice(tk, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
    val hs = transform(sh, x => md5(x.cast("binary")))
    val wins = when(size(hs) >= w,
      transform(sequence(lit(0), size(hs) - w),
        i => array_min(slice(hs, i + 1, lit(w)))))
      .otherwise(array().cast("array<string>"))
    val both = docs.select(
      array_sort(array_distinct(wins)).as("hof"),
      array_sort(WinnowFingerprints.winnow($"text", k, w)).as("fused"))
    assert(both.filter(!($"hof" <=> $"fused")).count() == 0)
  }

  test("cosine: identity, orthogonality, symmetry") {
    val df = Seq(
      (Seq(1f, 0f, 0f), Seq(1f, 0f, 0f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (Seq(1f, 2f, 3f), Seq(3f, 2f, 1f))).toDF("a", "b")
    val got = df.select(cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    val rev = df.select(cosine($"b", $"a")).as[Double].collect()
    assert(got.zip(rev).forall { case (x, y) => math.abs(x - y) < 1e-12 })
  }

  test("hyperplane buckets: identical vectors share a bucket, range bounded") {
    val df = Seq(Seq(1f, 2f, 3f, 4f), Seq(1f, 2f, 3f, 4f),
      Seq(-1f, -2f, -3f, -4f)).toDF("v")
    val b = df.select(hyperplaneBucket($"v", 8, 42)).as[Long].collect()
    assert(b(0) == b(1))
    assert(b.forall(x => x >= 0 && x < 256))
    // antipodal vector flips every plane sign → complementary bucket
    assert(b(2) == 255 - b(0))
  }

  test("unicode: NFC composes decomposed accents, ASCII untouched") {
    import graft.functions.UnicodeNorm._
    val df = Seq(
      "plain ascii text",
      "été",          // decomposed é → composed
      "café",                // already NFC: unchanged
      "각"        // Hangul Jamo → syllable 각
    ).toDF("s")
    val got = df.select(nfcNormalize($"s")).as[String].collect()
    assert(got(0) == "plain ascii text")
    assert(got(1) == "été" && got(1).length == 3)
    assert(got(2) == "café")
    assert(got(3) == "각" && got(3).length == 1)
  }

  test("unicode: strip_accents drops Mn marks, recomposes, keeps non-Latin") {
    import graft.functions.UnicodeNorm._
    val df = Seq(
      "naïve café",     // naïve café → naive cafe
      "İstanbul",            // İ → I (dot above is Mn)
      "Łukasz",              // Ł has no decomposition: unchanged
      "한국",             // Hangul: NFD→Jamo→recompose, unchanged
      "ḉǻ",             // multi-mark stacks ḉǻ → ca
      "ώρα"        // ώρα → ωρα (Greek base kept)
    ).toDF("s")
    val got = df.select(stripAccentsCol($"s")).as[String].collect()
    assert(got(0) == "naive cafe")
    assert(got(1) == "Istanbul")
    assert(got(2) == "Łukasz")
    assert(got(3) == "한국")
    assert(got(4) == "ca")
    assert(got(5) == "ωρα")
  }

  test("MathLn = Math.log (libm), not StrictMath: the ln(3) ulp pin") {
    import graft.functions.MathLn.ln
    val df3 = Seq(1).toDF("one")
    val got = df3.select(ln(lit(3.0)), ln(lit(501.0 / 374.0))).head()
    // Math.log(3.0) = ...098; StrictMath (Spark's log()) = ...096.
    // DuckDB/libm agree with Math.log — this pin catches any engine
    // change that would silently re-route q75/q76 logs to StrictMath.
    assert(got.getDouble(0) == Math.log(3.0))
    assert(java.lang.Double.toString(got.getDouble(0)) == "1.0986122886681098")
    assert(got.getDouble(1) == Math.log(501.0 / 374.0))
    val n = df3.select(ln(lit(null).cast("double"))).head()
    assert(n.isNullAt(0))
  }

  test("unicode: nulls propagate, ligatures survive canonical forms") {
    import graft.functions.UnicodeNorm._
    val df = Seq(Some("ﬁn"), None).toDF("s")
    val got = df.select(nfcNormalize($"s"), stripAccentsCol($"s")).collect()
    // ﬁ is a COMPATIBILITY ligature: NFC/NFD leave it alone
    assert(got(0).getString(0) == "ﬁn" && got(0).getString(1) == "ﬁn")
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
  }

  test("covered_positions: overlap collapse, repeats, edges, case fold") {
    import graft.functions.CoveredPositions.coveredPositions
    val df = Seq(
      ("a b c d e f g", Seq("a b c d e", "c d e f g")), // overlap -> all 7
      ("a b c d e f g", Seq("z z z z z")),              // no match -> 0
      ("a b c d", Seq("a b c d e")),                    // doc < k tokens -> 0
      ("a b c d e", Seq.empty[String]),                 // no templates -> 0
      ("a b c d e", Seq("a b")),                        // malformed pattern -> 0
      ("x a b c d e x a b c d e", Seq("a b c d e")),    // 2 occurrences -> 10
      ("A B C D E", Seq("a b c d e"))                   // text case-folds -> 5
    ).toDF("text", "pats")
    val got = df.select(coveredPositions($"text", $"pats", 5).as("c"))
      .as[Long].collect().toSeq
    assert(got == Seq(7L, 0L, 0L, 0L, 0L, 10L, 5L), got)
  }

  test("bpe_apply: canonical left-to-right merging, rank precedence, goldens") {
    import graft.functions.BpeApply
    val e = BpeApply(org.apache.spark.sql.graftinterop.ColumnInterop
      .expression(lit("x")), Seq(("a", "a")))
    // left-to-right non-overlap within a run: (aa)(aa) / (aa)(aa)a
    assert(e.applyWord("aaaa") == 2)
    assert(e.applyWord("aaaaa") == 3)
    assert(e.applyWord("aaa") == 2)
    assert(e.applyWord("a") == 1)
    assert(e.applyWord("") == 0)
    // rank precedence: (e,r) consumes the r before (r,s) can see it
    val p = BpeApply(org.apache.spark.sql.graftinterop.ColumnInterop
      .expression(lit("x")), Seq(("e", "r"), ("r", "s")))
    assert(p.applyWord("ers") == 2)   // (er) s — rank 1 wins
    assert(p.applyWord("xrs") == 2)   // x (rs) — rank 2 free to apply
    // merged symbols never re-merge (single-round table)
    val q = BpeApply(org.apache.spark.sql.graftinterop.ColumnInterop
      .expression(lit("x")), Seq(("a", "b"), ("b", "c")))
    assert(q.applyWord("abc") == 2)   // (ab) c, NOT (abc)
    // TRAINED-table shape (q133): later ranks pair multi-char symbols
    // created by earlier ranks — rank-order chains through them
    val tr = BpeApply(org.apache.spark.sql.graftinterop.ColumnInterop
      .expression(lit("x")), Seq(("a", "b"), ("ab", "c"), ("abc", "abc")))
    assert(tr.applyWord("abc") == 1)        // (ab) → (abc)
    assert(tr.applyWord("abcabc") == 1)     // … → (abcabc) via rank 3
    assert(tr.applyWord("abcab") == 2)      // (abc)(ab) — rank 3 blocked
    assert(tr.applyWord("cab") == 2)        // c (ab) — b consumed at rank 1
    // non-BMP code points are single symbols
    assert(q.applyWord("𝕊x") == 2)
    // full doc pass: chars and post-merge counts per whitespace word
    val row = Seq("aaaa ers  AB").toDF("t")
      .select(BpeApply.bpeApply($"t",
        Seq(("a", "a"), ("e", "r"), ("a", "b"))).as("st"))
      .select($"st.n_chars", $"st.n_bpe").head()
    // lowercased: "aaaa"(4c->2), "ers"(3c->2), "ab"(2c->1)
    assert(row.getLong(0) == 9L && row.getLong(1) == 5L, row.toString)
  }
}
