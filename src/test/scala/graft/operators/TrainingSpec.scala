package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-2 training-pipeline operators
  * (q49-q55) — the DuckDB oracle checks value parity; these check the
  * operators mean what they claim.
  */
class TrainingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("as-of join: every matched prev event is strictly resolvable and at-or-before") {
    val r = q("q49_asof_join").cache()
    assert(r.count() > 0)
    // at-or-before: gap >= 0 whenever matched
    assert(r.filter($"gap_us" < 0).count() == 0)
    // the purchase itself is never its own match
    assert(r.filter($"prev_event_id" === $"event_id").count() == 0)
    // unmatched rows are all-null on the prev_* side
    assert(r.filter($"prev_event_id".isNull && $"prev_ts_us".isNotNull)
      .count() == 0)
    // optimality: no other non-purchase event of the same user lies
    // strictly between the chosen prev and the purchase
    val ev = graft.Tables.load(spark, dir, "events")
      .filter($"event_type" =!= "purchase")
      .select($"user_id", unix_micros($"ts").as("e_us"), $"event_id".as("e_id"))
    val matched = r.filter($"prev_event_id".isNotNull)
    val better = matched.join(ev, Seq("user_id"))
      .filter($"e_us" <= $"ts_us" &&
        ($"e_us" > $"prev_ts_us" ||
          ($"e_us" === $"prev_ts_us" && $"e_id" > $"prev_event_id")))
    assert(better.count() == 0)
    r.unpersist()
  }

  test("decontamination: flagged docs genuinely share a 5-gram with the eval split") {
    val r = q("q50_decontaminate")
    // every flagged doc is a train doc with positive overlap
    assert(r.filter($"doc_id" % 20 === 0).count() == 0)
    assert(r.filter($"n_shared_shingles" < 1 || $"n_eval_docs" < 1).count() == 0)
  }

  test("repetition signals are bounded and consistent") {
    val r = q("q51_repetition").cache()
    assert(r.count() > 0)
    assert(r.filter($"repetition_ratio" < 0 || $"repetition_ratio" >= 1).count() == 0)
    assert(r.filter($"top_token_frac" <= 0 || $"top_token_frac" > 1).count() == 0)
    assert(r.filter($"n_distinct_tokens" > $"n_tokens").count() == 0)
    r.unpersist()
  }

  test("pivot columns reconcile with the unpivoted total") {
    val r = q("q52_pivot_priority")
    val pivotTotal = r.select(
      (coalesce($"urgent", lit(0.0)) + coalesce($"high", lit(0.0)) +
        coalesce($"medium", lit(0.0)) + coalesce($"not_specified", lit(0.0)) +
        coalesce($"low", lit(0.0))).as("t"))
      .agg(sum($"t")).as[Double].head()
    val direct = graft.Tables.load(spark, dir, "orders")
      .agg(sum($"o_totalprice".cast("decimal(12,2)")).cast("double"))
      .as[Double].head()
    assert(math.abs(pivotTotal - direct) < 1e-6 * math.abs(direct))
  }

  test("approx_percentile tracks the exact percentile within sketch accuracy") {
    val exact = q("q53_percentiles")
    val approx = graft.Tables.load(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(expr(
        "approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D), 10000)")
        .as("ap"))
      .select($"l_returnflag", $"ap"(0).as("a25"), $"ap"(1).as("a50"),
        $"ap"(2).as("a75"), $"ap"(3).as("a95"))
    val j = exact.join(approx, "l_returnflag").collect()
    assert(j.nonEmpty)
    j.foreach { row =>
      // at accuracy 10000 on sf0.001 group sizes the sketch is near-exact;
      // allow 2% relative slack
      Seq(("p25", "a25"), ("p50", "a50"), ("p75", "a75"), ("p95", "a95"))
        .foreach { case (e, a) =>
          val ev = row.getAs[Double](e)
          val av = row.getAs[Double](a)
          assert(math.abs(ev - av) <= 0.02 * math.abs(ev),
            s"$e=$ev vs $a=$av for ${row.getAs[String]("l_returnflag")}")
        }
    }
  }

  test("winnowing: every doc (all have ≥6 tokens) fingerprinted, hex-shaped, deterministic") {
    val r = q("q56_winnowing").cache()
    val docs = graft.Tables.load(spark, dir, "documents")
    assert(r.select($"doc_id").distinct().count() == docs.count())
    assert(r.filter(!$"fp".rlike("^[0-9a-f]{32}$")).count() == 0)
    // winnowing density: ~2/(w+1) of the k-gram positions are kept;
    // distinct minima can only be fewer
    val tooMany = r.groupBy($"doc_id").count()
      .join(docs.select($"doc_id",
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split($"text", "\\s+")).as("nt")),
        "doc_id")
      .filter($"count" > $"nt")
    assert(tooMany.count() == 0)
    r.unpersist()
  }

  test("fast corpus-overlap sketch tracks the oracle-checked md5 sketch") {
    val oracle = q("q66_corpus_overlap").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val fast = q("q67_corpus_overlap_fast").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(fast.keySet == oracle.keySet)
    assert(fast.nonEmpty)
    // both are 32-position min-hash estimates of the SAME underlying
    // Jaccard, just different hash families; SE ≈ sqrt(J(1-J)/32) ≤ 0.09
    // → allow 4 positions (0.125) of disagreement plus both being noisy
    fast.foreach { case (k, v) =>
      assert(math.abs(v - oracle(k)) <= 0.25, s"$k: fast=$v oracle=${oracle(k)}")
    }
  }

  test("bloom-prefiltered decontamination is row-identical to the exact form") {
    // q81 = q50 behind a bloom prefilter: no false negatives (bloom) +
    // exact join removes false positives → same rows, always. The gate
    // checks this against DuckDB at sf0.01; pin it here at sf0.001 too
    // so a refactor can't silently fork the twins.
    val exact = q("q50_decontaminate").collect().map(_.toSeq).toSeq
    val bloom = q("q81_bloom_decontaminate").collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty)
    assert(bloom == exact)
  }

  test("bloom prefilter prunes train-side shingles before the join shuffle") {
    // the point of q81 at 100 TB: the shuffle carries only candidate
    // rows. Re-create the two sides and check the bloom actually
    // rejects a meaningful share of clean train shingles (fpp is 1%,
    // so anything surviving ≫ true-hit count would mean the prefilter
    // is wired wrong / always-true).
    import graft.functions.BloomFilterOps.{bloomAgg, mightContain}
    import org.apache.spark.sql.graftinterop.ColumnInterop
    val sh = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(graft.functions.Shingles.shingles($"text", 5)).as("sh"))
    val train = sh.filter($"doc_id" % 20 =!= 0)
    val eval_ = sh.filter($"doc_id" % 20 === 0)
    val bloom = eval_.agg(
      bloomAgg(xxhash64($"sh"), 1000000L, 8388608L).as("bf"))
    val kept = train.filter(mightContain(
      ColumnInterop.scalarSubquery(bloom), xxhash64($"sh"))).count()
    val total = train.count()
    val trueHits = train.join(eval_.select($"sh").distinct(), Seq("sh")).count()
    assert(kept >= trueHits, "bloom must never drop a true hit")
    assert(kept < total,
      s"bloom kept all $total train shingles — prefilter is not pruning")
    // kept = true hits + fp noise; with 1% fpp the noise is ≤ a few
    // percent of the clean rows, far below the clean total
    assert(kept - trueHits <= (total - trueHits) / 10,
      s"false-positive share too high: kept=$kept trueHits=$trueHits total=$total")
  }

  test("dup-ngram fraction: internally consistent, near-dup docs score > 0") {
    val rows = q("q83_dup_ngram_fraction")
      .select($"doc_id", $"n_shingles", $"n_dup", $"dup_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, d, f) =>
      assert(n > 0 && d >= 0 && d <= n)
      assert(math.abs(f - d.toDouble / n) < 1e-15)
    }
    // corpus-scope signal: members of verified near-dup clusters (q70)
    // share long spans, so their duplicated-5-gram count is positive —
    // the property per-doc signals (q51) can't detect
    val dupDocs = q("q70_dedup_resolve")
      .select($"doc_id").as[Long].collect().toSet
    assert(dupDocs.nonEmpty)
    val flagged = rows.filter(r0 => dupDocs.contains(r0._1))
    assert(flagged.nonEmpty)
    flagged.foreach { case (id, _, d, _) =>
      assert(d > 0, s"near-dup doc $id has no duplicated 5-grams")
    }
  }

  test("simhash oracle twin packs 32-bit halves and is deterministic") {
    val r1 = q("q55_simhash_oracle").collect()
    val r2 = q("q55_simhash_oracle").collect()
    assert(r1.nonEmpty)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
    r1.foreach { row =>
      val lo = row.getAs[Long]("sig_lo"); val hi = row.getAs[Long]("sig_hi")
      assert(lo >= 0L && lo <= 0xffffffffL)
      assert(hi >= 0L && hi <= 0xffffffffL)
    }
  }

  test("chunking: stride, window-fill, coverage, and text/count parity per doc") {
    val r = q("q96_chunk_overlap").cache()
    assert(r.count() > 0)
    // every chunk starts exactly on its stride boundary
    assert(r.filter($"start_tok" =!= $"chunk_idx" * 24).count() == 0)
    // non-empty, never wider than the window
    assert(r.filter($"n_tok_chunk" < 1 || $"n_tok_chunk" > 32).count() == 0)
    // all chunks except each doc's last are full windows
    val lastK = r.groupBy($"doc_id").agg(max($"chunk_idx").as("last_k"))
    assert(r.join(lastK, "doc_id")
      .filter($"chunk_idx" < $"last_k" && $"n_tok_chunk" =!= 32).count() == 0)
    // coverage: the last chunk ends exactly at the doc's token count, so
    // the union of windows is the whole document (stride < window ⇒ no gaps)
    val docToks = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id",
        size(graft.functions.TextFunctions.tokens($"text")).as("n"))
    val ends = r.groupBy($"doc_id")
      .agg(max($"start_tok" + $"n_tok_chunk").as("covered"))
    assert(ends.join(docToks, "doc_id").filter($"covered" =!= $"n").count() == 0)
    // chunk_text really contains n_tok_chunk tokens
    assert(r.filter(size(split($"chunk_text", " ")) =!= $"n_tok_chunk")
      .count() == 0)
    r.unpersist()
  }

  test("boilerplate inventory: recurring cross-doc 5-grams, counts recheck exactly") {
    val r = q("q99_boilerplate_ngrams").cache()
    assert(r.count() > 0)
    assert(r.filter($"n_docs" < 2).count() == 0)
    assert(r.filter($"rnk" < 1 || $"rnk" > 10).count() == 0)
    // a shingle is exactly 5 tokens
    assert(r.filter(size(split($"shingle", " ")) =!= 5).count() == 0)
    // independent recount: n_docs = #distinct docs of that source
    // containing the shingle (shingleSet is per-doc distinct)
    val sh = graft.Tables.load(spark, dir, "documents")
      .select($"source", $"doc_id",
        explode(graft.functions.TextFunctions.shingleSet($"text", 5))
          .as("shingle"))
    val recount = sh.groupBy($"source", $"shingle")
      .agg(countDistinct($"doc_id").as("m"))
    assert(r.join(recount, Seq("source", "shingle"))
      .filter($"n_docs" =!= $"m").count() == 0)
    r.unpersist()
  }

  test("boilerplate strip: driver replay of inventory + positional coverage") {
    val docs = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = t.trim.toLowerCase.split("\\s+", -1)
    def sh5(w: Array[String]): Seq[(Int, String)] =
      if (w.length < 5) Seq.empty
      else (0 to w.length - 5).map(i => i -> w.slice(i, i + 5).mkString(" "))
    // inventory: df over per-doc-distinct shingles, ≥2, top-10/(−df, shingle)
    val dfreq = docs.toSeq
      .flatMap { case (_, src, t) =>
        sh5(toks(t)).map(_._2).distinct.map(s => (src, s)) }
      .groupBy(identity).view.mapValues(_.size).toSeq
      .map { case ((src, s), n) => (src, s, n) }
    val inv: Map[String, Set[String]] = dfreq.filter(_._3 >= 2)
      .groupBy(_._1).view.mapValues { xs =>
        xs.sortBy { case (_, s, n) => (-n, s) }.take(10).map(_._2).toSet
      }.toMap
    val expected = docs.map { case (id, src, t) =>
      val w = toks(t)
      val boiler = inv.getOrElse(src, Set.empty)
      val covered = sh5(w).collect { case (i, s) if boiler(s) => i }
        .flatMap(i => (i + 1) to (i + 5)).toSet
      id -> ((w.length.toLong, covered.size.toLong))
    }.toMap
    val got = q("q123_boilerplate_strip").collect()
    assert(got.length == docs.length) // every doc accounted, hit or not
    // the corpus genuinely exercises the join (some coverage exists)
    assert(got.map(_.getAs[Long]("n_boiler_tokens")).sum > 0)
    got.foreach { r =>
      val (nt, nb) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") == nt, s"n_tokens ${r}")
      assert(r.getAs[Long]("n_boiler_tokens") == nb, s"coverage ${r}")
      assert(r.getAs[Long]("n_kept") == nt - nb)
    }
  }

  test("source KL: driver replay in micro-nats, nonnegative up to quantization") {
    val words = graft.Tables.load(spark, dir, "documents")
      .select($"source", explode(
        graft.functions.TextFunctions.tokens($"text")).as("word"))
      .groupBy($"source", $"word").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val cW = words.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val nS = words.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n = words.map(_._3).sum
    val expected = words.groupBy(_._1).map { case (src, xs) =>
      val ns = nS(src)
      val kl = xs.map { case (_, w, c) =>
        val p = c.toDouble / ns.toDouble
        val r = (c.toDouble * n.toDouble) / (ns.toDouble * cW(w).toDouble)
        math.floor(p * math.log(r) * 1e4).toLong * 100
      }.sum
      src -> ((ns, xs.length.toLong, kl))
    }
    val got = q("q125_source_kl").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (ns, nTerms, kl) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_tokens") == ns)
      assert(r.getAs[Long]("n_terms") == nTerms)
      assert(r.getAs[Long]("kl_unat") == kl, s"kl mismatch ${r}")
      // true KL ≥ 0; each floor loses < 100 µnat
      assert(kl >= -100L * nTerms)
    }
    // sources differ from the corpus, so at least one KL is strictly > 0
    assert(got.map(_.getAs[Long]("kl_unat")).max > 0)
  }

  test("quality calibration: exact permille ranks, halves split per source") {
    val r = q("q127_quality_calibrate").collect()
    assert(r.nonEmpty)
    val bySrc = r.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rows) =>
      val n = rows.length.toLong
      // ranks are a permutation of 1..n
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to n), src)
      rows.foreach { row =>
        assert(row.getAs[Long]("n_src") == n)
        val rk = row.getAs[Long]("rk")
        val exp = ((rk - 1) * 1000) / math.max(n - 1, 1)
        assert(row.getAs[Long]("pct_permille") == exp, row)
        assert(row.getAs[Boolean]("keep_top_half") == (exp < 500))
      }
      // best doc sits at 0; worst at 1000 (whenever the source has ≥ 2)
      if (n >= 2) {
        assert(rows.map(_.getAs[Long]("pct_permille")).min == 0L)
        assert(rows.map(_.getAs[Long]("pct_permille")).max == 1000L)
      }
      // rank order agrees with quality order (desc, doc_id tie-break)
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        val (qa, qb) = (a.getAs[Long]("qmu"), b.getAs[Long]("qmu"))
        assert(qa > qb || (qa == qb &&
          a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")), s"$a !>= $b")
      }
    }
  }

  test("perplexity buckets: tertiles partition each source, fluency-ordered") {
    val r = q("q101_perplexity_buckets").cache()
    // every source has exactly buckets 1..3
    val shape = r.groupBy($"source").agg(
      countDistinct($"bucket").as("nb"),
      min($"bucket").as("lo"), max($"bucket").as("hi"))
    assert(shape.filter($"nb" =!= 3 || $"lo" =!= 1 || $"hi" =!= 3).count() == 0)
    // bucket doc counts partition the source's documents, sizes within 1
    val docs = graft.Tables.load(spark, dir, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n_total"))
    val sums = r.groupBy($"source").agg(
      sum($"n_docs").as("n_sum"),
      (max($"n_docs") - min($"n_docs")).as("spread"))
    assert(sums.join(docs, "source")
      .filter($"n_sum" =!= $"n_total" || $"spread" > 1).count() == 0)
    // fluency ordering: head's worst doc is at least the middle's best,
    // middle's worst at least the tail's best (ties may touch, not cross)
    val b = r.select($"source", $"bucket", $"min_avg_logprob",
      $"max_avg_logprob").collect()
      .map(x => (x.getString(0), x.getInt(1)) -> (x.getDouble(2), x.getDouble(3)))
      .toMap
    b.keys.map(_._1).toSet.foreach { (src: String) =>
      assert(b((src, 1))._1 >= b((src, 2))._2, s"$src: head/middle overlap")
      assert(b((src, 2))._1 >= b((src, 3))._2, s"$src: middle/tail overlap")
    }
    // bucket average sits between the bucket's min and max
    assert(r.filter($"bucket_avg_logprob" < $"min_avg_logprob" - 1e-9 ||
      $"bucket_avg_logprob" > $"max_avg_logprob" + 1e-9).count() == 0)
    r.unpersist()
  }

  test("bigram LM: every doc scored, n_bigrams = tokens - 1, log-probs negative") {
    val r = q("q104_bigram_logprob").cache()
    val docToks = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id",
        size(graft.functions.TextFunctions.tokens($"text")).as("n_tok"))
    // every document appears (all test docs have >= 2 tokens) with
    // exactly tokens-1 bigrams
    assert(r.count() == docToks.count())
    assert(r.join(docToks, "doc_id")
      .filter($"n_bigrams" =!= $"n_tok" - 1).count() == 0)
    // probabilities are <= 1, so the micro-nat sums and averages are <= 0
    assert(r.filter($"sum_lp_micro" > 0 || $"avg_logprob" > 0).count() == 0)
    // the reported average is exactly the two closing divisions
    assert(r.filter(
      abs($"avg_logprob" - $"sum_lp_micro".cast("double")
        / $"n_bigrams".cast("double") / 1e6) > 0.0).count() == 0)
    r.unpersist()
  }

  test("zipf slope: negative power-law fit per source, exact vocab count") {
    val r = q("q107_zipf_slope").cache()
    val vocab = graft.Tables.load(spark, dir, "documents")
      .select($"source",
        explode(graft.functions.TextFunctions.tokens($"text")).as("word"))
      .groupBy($"source").agg(countDistinct($"word").as("v"))
    // one row per source; n_words is exactly the source vocabulary size
    assert(r.count() == vocab.count())
    assert(r.join(vocab, "source").filter($"n_words" =!= $"v").count() == 0)
    // Rank-frequency is monotone-decreasing by construction, so every
    // fitted slope is non-positive (exactly 0 only for the degenerate
    // all-counts-equal source); the band is loose because tiny sf0.001
    // sources are only weakly Zipfian (measured −0.15 on the smallest
    // source). The intercept (ln-freq at rank 1) stays ≥ 0.
    r.collect().foreach { row =>
      val (slope, icpt) = (row.getAs[Double]("zipf_slope"),
        row.getAs[Double]("intercept_nat"))
      assert(slope <= 0.0 && slope > -3.0, s"${row.getString(0)}: $slope")
      assert(icpt >= 0.0, s"${row.getString(0)}: intercept $icpt")
    }
    r.unpersist()
  }

  test("bpe pairs: exact driver recount reproduces the top-50 merge table") {
    val r = q("q109_bpe_pairs").collect()
    assert(r.length == 50)
    // independent ground truth: tokenize every document on the driver
    // with the same lower/trim/\s+ rule and recount adjacent char pairs
    // weighted by word frequency (overlapping positions included — the
    // BPE counting rule)
    val texts = graft.Tables.load(spark, dir, "documents")
      .select($"text").as[String].collect()
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      t.toLowerCase.trim.split("\\s+").filter(_.length >= 2).foreach { w =>
        (0 until w.length - 1).foreach { i =>
          val k = (w.substring(i, i + 1), w.substring(i + 1, i + 2))
          counts(k) = counts.getOrElse(k, 0L) + 1L
        }
      }
    }
    val expected = counts.toSeq
      .map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }.take(50)
    val got = r.map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(got == expected)
  }

  test("source overlap: shared counts bounded by set sizes, jaccard consistent") {
    val r = q("q111_source_overlap").cache()
    assert(r.count() > 0)
    // pair orientation and bounds
    assert(r.filter($"source_a" >= $"source_b").count() == 0)
    assert(r.filter($"n_shared" > least($"na", $"nb")).count() == 0)
    assert(r.filter($"n_shared" <= 0).count() == 0)
    // jaccard re-derives exactly from the three integer columns
    val bad = r.filter(abs($"jaccard" -
      $"n_shared".cast("double") / ($"na" + $"nb" - $"n_shared").cast("double"))
      > lit(0.0)).count()
    assert(bad == 0)
    // one pair re-verified from scratch via the fused shingle expression
    val ss = graft.Tables.load(spark, dir, "documents")
      .select($"source",
        explode(graft.functions.Shingles.shingles($"text", 5)).as("sh"))
      .distinct().as[(String, String)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val head = r.orderBy($"source_a", $"source_b").first()
    val sa = head.getAs[String]("source_a")
    val sb = head.getAs[String]("source_b")
    val inter = (ss(sa) & ss(sb)).size.toLong
    assert(head.getAs[Long]("n_shared") == inter)
    assert(head.getAs[Long]("na") == ss(sa).size.toLong)
    assert(head.getAs[Long]("nb") == ss(sb).size.toLong)
    r.unpersist()
  }

  test("span corruption: driver hash replay, ~15% mask rate, span identities") {
    import graft.functions.Affine61.{mixA, mixB}
    val r = q("q113_span_corruption").cache()
    // structural identities: masked ≤ tokens, spans ≤ masked, spans ≤
    // ⌈tokens/2⌉ (maximal runs need a gap between them)
    assert(r.filter($"n_masked" > $"n_tokens").count() == 0)
    assert(r.filter($"n_spans" > $"n_masked").count() == 0)
    assert(r.filter($"n_spans" > ($"n_tokens" + 1) / 2).count() == 0)
    assert(r.filter($"n_spans" === 0 && $"n_masked" > 0).count() == 0)
    // the Bernoulli(15%) policy holds corpus-wide
    val tot = r.agg(sum($"n_tokens").cast("double"),
      sum($"n_masked").cast("double")).head()
    val rate = tot.getDouble(1) / tot.getDouble(0)
    assert(rate > 0.12 && rate < 0.18, s"corpus mask rate $rate")
    // exact replay of one document's masking on the driver
    val doc = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").orderBy($"doc_id").first()
    val (id, text) = (doc.getLong(0), doc.getString(1))
    val masks = text.toLowerCase.trim.split("\\s+").indices.map { p0 =>
      val m1 = graft.functions.MulMod61.affine(mixA, mixB, id)
      val key = (m1 + (p0 + 1)) % graft.functions.MulMod61.P
      graft.functions.MulMod61.affine(mixA, mixB, key) % 100 < 15
    }
    val nMasked = masks.count(identity).toLong
    val nSpans = masks.zip(false +: masks.init)
      .count { case (m, pm) => m && !pm }.toLong
    val row = r.filter($"doc_id" === id).head()
    assert(row.getAs[Long]("n_tokens") == masks.length.toLong)
    assert(row.getAs[Long]("n_masked") == nMasked)
    assert(row.getAs[Long]("n_spans") == nSpans)
    r.unpersist()
  }

  test("epoch shuffle: per-epoch permutation, contiguous shard positions, epochs differ") {
    val r = q("q114_epoch_shuffle").cache()
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    // each epoch covers every document exactly once
    assert(r.count() == 2 * nDocs)
    assert(r.groupBy($"epoch").agg(countDistinct($"doc_id").as("n"))
      .filter($"n" =!= nDocs).count() == 0)
    // positions within each (epoch, shard) are 1..count with no gaps
    val bad = r.groupBy($"epoch", $"shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("lo"), max($"pos").as("hi"),
        countDistinct($"pos").as("np"))
      .filter($"lo" =!= 1 || $"hi" =!= $"n" || $"np" =!= $"n")
    assert(bad.count() == 0)
    // consecutive epochs order the corpus differently: most documents
    // land on a different (shard, pos) in epoch 2
    val e1 = r.filter($"epoch" === 1)
      .select($"doc_id", $"shard".as("s1"), $"pos".as("p1"))
    val e2 = r.filter($"epoch" === 2)
      .select($"doc_id", $"shard".as("s2"), $"pos".as("p2"))
    val moved = e1.join(e2, "doc_id")
      .filter($"s1" =!= $"s2" || $"p1" =!= $"p2").count()
    assert(moved > nDocs * 0.8, s"only $moved of $nDocs docs moved")
    // pure function of (doc_id, epoch): a re-run is row-identical
    val again = q("q114_epoch_shuffle")
    assert(r.exceptAll(again).count() == 0 && again.exceptAll(r).count() == 0)
    r.unpersist()
  }

  test("q131 BPE trainer: hand-computed merge trajectory, multi-round symbols, exhaustion") {
    // wc: abab×3, abc×2, cd×5 —
    //   round 1: (a,b) 3·2+2 = 8 wins over (c,d) 5
    //   round 2: (c,d) 5 wins over (ab,ab) 3 — multi-char pair present
    //   round 3: (ab,ab) 3; round 4: (ab,c) 2; then NO pairs remain,
    //   so asking for 10 merges must return exactly 4 (early stop).
    val docs = Seq(
      (1L, "abab abab abab abc abc"),
      (2L, "cd cd cd cd cd")
    ).toDF("doc_id", "text")
    val m = TextQueries.bpeTrain(docs, 10)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(m == Seq(
      (1L, "a", "b", 8L),
      (2L, "c", "d", 5L),
      (3L, "ab", "ab", 3L),
      (4L, "ab", "c", 2L)), m.toString)
  }

  test("q133 trained-table application: hand-computed trajectory on the q131 fixture") {
    // Trained table on the q131 fixture (proved above):
    //   1:(a,b)  2:(c,d)  3:(ab,ab)  4:(ab,c)
    // Rank-order application (= Sennrich apply_bpe for a trained table —
    // later ranks reference symbols EARLIER ranks created, never the
    // reverse, so one pass per merge in rank order is exact):
    //   "abab": a b a b →1→ (ab)(ab) →3→ (abab)          = 1 symbol
    //   "abc":  a b c   →1→ (ab) c   →4→ (abc)           = 1 symbol
    //   "cd":   c d     →2→ (cd)                         = 1 symbol
    // doc 1: 5 ws tokens, 3·4+2·3 = 18 chars, 3+2 = 5 bpe, saved 13
    // doc 2: 5 ws tokens, 10 chars, 5 bpe, saved 5
    val docs = Seq(
      (1L, "abab abab abab abc abc"),
      (2L, "cd cd cd cd cd")
    ).toDF("doc_id", "text")
    val trained = TextQueries.bpeTrain(docs, 10)
      .select($"a", $"b").as[(String, String)].collect().toSeq
    val got = docs
      .select($"doc_id",
        graft.functions.BpeApply.bpeApply($"text", trained).as("st"))
      .select($"doc_id", $"st.n_chars", $"st.n_bpe")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 18L, 5L), (2L, 10L, 5L)), got.toString)
  }

  test("q133's trained tables are unique-output on the gate corpora") {
    // The single-pass == apply_bpe equivalence (Round11Props) holds
    // for UNIQUE-OUTPUT tables: no two merges concatenating to the
    // same string (else the symbol gains a second, later creation
    // path and greedy revisits an earlier rank — the duplicate-output
    // boundary pin). Real training CAN emit such twins, so check the
    // tables q133/q134 actually run with: the 16-round q131 trainer's
    // outputs on the gate corpora must be pairwise distinct.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = graft.Tables.load(spark, s"/root/testdata/$sf", "documents")
      val outs = TextQueries.bpeTrain(docs, 16)
        .select($"a", $"b").as[(String, String)].collect()
        .map { case (a, b) => a + b }
      assert(outs.distinct.length == outs.length,
        s"$sf trained table has duplicate-output merges: ${outs.mkString(",")}")
    }
  }
}
