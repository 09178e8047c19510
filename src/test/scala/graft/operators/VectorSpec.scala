package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class VectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("LSH ANN results are a subset of correct cosine scores (precision)") {
    // every (q_id, vec_id, cos_sim) reported by the bucketed ANN must
    // agree with the exact cosine computed by the brute-force query
    val exact = VectorQueries.all.find(_.name == "q39_cosine_topk").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    val ann = VectorQueries.all.find(_.name == "q41_lsh_ann").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(ann.nonEmpty)
    // where ANN found a true top-5 neighbor, the score must match exactly
    ann.foreach { case (q, v, c) =>
      exact.get((q, v)).foreach(e => assert(math.abs(e - c) < 1e-12))
    }
  }

  test("IVF ANN: scores agree with exact cosine; shape bounded") {
    val exact = VectorQueries.all.find(_.name == "q39_cosine_topk").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    val ivf = VectorQueries.all.find(_.name == "q43_ivf_ann").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id", $"cos_sim", $"rnk")
      .as[(Long, Long, Double, Long)].collect()
    assert(ivf.nonEmpty)
    val perQuery = ivf.groupBy(_._1)
    perQuery.values.foreach { rows =>
      assert(rows.length <= 5)
      val sims = rows.sortBy(_._4).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // any candidate also in the exact top-5 must carry the exact score
    ivf.foreach { case (q, v, c, _) =>
      exact.get((q, v)).foreach(e => assert(math.abs(e - c) < 1e-12))
    }
  }

  test("IVF ANN k-means cells: recall@5 beats the round-2 stride baseline, deterministically") {
    // Round-2 stride-sampled centroids measured recall@5 = 0.60 at
    // sf0.001 on these same 10 queries (0.40 at sf0.01, 0.38 at sf0.1);
    // one Lloyd update lifts that to 0.66 / 0.56 / 0.42 (NOTES.md round
    // 3). The build must also be deterministic (quantized integer sums —
    // no float-order effects).
    val exact = VectorQueries.all.find(_.name == "q39_cosine_topk").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val run1 = VectorQueries.all.find(_.name == "q43_ivf_ann").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id", $"cos_sim", $"rnk")
      .as[(Long, Long, Double, Long)].collect()
    val run2 = VectorQueries.all.find(_.name == "q43_ivf_ann").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id", $"cos_sim", $"rnk")
      .as[(Long, Long, Double, Long)].collect()
    assert(run1.sortBy(r => (r._1, r._4)).toSeq ==
      run2.sortBy(r => (r._1, r._4)).toSeq)
    val got = run1.map(r => (r._1, r._2)).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall > 0.60, s"recall@5 $recall not above stride baseline 0.60")
  }

  test("multi-probe LSH: recall@5 is at least single-probe q41's") {
    // q94's candidates are a superset of q41's and cosine ordering is
    // global, so any item it displaces from q41's top-5 is displaced by
    // a true-top-5 member — recall is monotone in the probe set
    val exact = VectorQueries.all.find(_.name == "q39_cosine_topk").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    def recallOf(name: String): Double = {
      val got = VectorQueries.all.find(_.name == name).get
        .run(spark, sfDir)
        .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val single = recallOf("q41_lsh_ann")
    val multi = recallOf("q94_multiprobe_ann")
    assert(multi >= single, s"multi-probe recall $multi < single $single")
    // at 8 planes / 500 vectors each probe covers ~1/256 of the space,
    // so absolute recall is small for both forms — measured: q41 0.02 /
    // 0.02 / 0.00 and q94 0.14 / 0.16 / 0.10 at sf0.001/0.01/0.1 (a
    // 5-8× lift from the 9-probe expansion). The guarantee under test
    // is the monotone improvement; production tunes planes/probes to
    // the recall target
    assert(multi > 0.0, s"multi-probe recall@5 $multi — no overlap at all")
  }

  test("IVF recall curve: nProbe sweep for stride vs farthest-first init") {
    // The round-6 verdict asked for the measured dial: recall@5 against
    // the q39 ground truth, per init strategy, as nProbe grows. Prints
    // the full table (captured in NOTES.md); pins the two structural
    // guarantees — recall is monotone nondecreasing in nProbe (probe
    // sets are nested), and at full probe (nProbe = the ACTUAL cell
    // count — the stride can land NCells+1 init points, e.g. 12 at
    // sf0.1, and Lloyd can drop emptied cells) the IVF result IS the
    // exact result (every cell probed ⇒ every candidate scored).
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val exact = VectorQueries.all.find(_.name == "q39_cosine_topk").get
        .run(spark, dir)
        .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
      for (pp <- Seq(false, true)) {
        val cells = VectorQueries.ivfCells(spark, dir, plusPlus = pp)
        val curve = (Seq(1, 2, 3, 5, 8) :+ cells.size).map { nProbe =>
          val got = VectorQueries.ivfTopKWith(spark, dir, cells, nProbe)
            .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
          nProbe -> (exact & got).size.toDouble / exact.size
        }
        info(s"$sf init=${if (pp) "farthest-first" else "stride"} " +
          curve.map { case (p, r) => f"p$p=$r%.2f" }.mkString(" "))
        curve.zip(curve.tail).foreach { case ((_, a), (p, b)) =>
          assert(b >= a, s"recall not monotone at nProbe=$p ($a -> $b)")
        }
        assert(curve.last._2 == 1.0,
          s"full probe must equal exact top-5, got ${curve.last._2}")
      }
    }
  }

  test("brute-force top-k is exact: k results per query, descending") {
    val got = VectorQueries.all.find(_.name == "q39_cosine_topk").get
      .run(spark, sfDir)
      .select($"q_id", $"rnk", $"cos_sim")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    got.values.foreach { rows =>
      assert(rows.length == 5)
      val sims = rows.sortBy(_._2).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("int8 ANN: high recall vs exact, approx scores tight, exact re-rank scores") {
    // int8 symmetric quantization keeps ~7 bits of per-dimension
    // precision — on 64-dim vectors the cosine error is ~1e-2, so the
    // approx top-5 should nearly always BE the exact top-5 (far
    // stronger than the bucketed ANNs' recall floors).
    val exact = VectorQueries.all.find(_.name == "q39_cosine_topk").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val exactScore = exact.map(r => (r._1, r._2) -> r._3).toMap
    val got = VectorQueries.all.find(_.name == "q82_int8_ann").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id", $"approx_cos", $"cos_sim")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    // the quantized score must sit close to the true cosine everywhere
    got.foreach { case (q, v, approx, ex) =>
      assert(math.abs(approx - ex) < 0.05, s"($q,$v): approx=$approx exact=$ex")
    }
    // survivors carry the EXACT re-ranked score (same fused kernel as q39)
    got.foreach { case (q, v, _, ex) =>
      exactScore.get((q, v)).foreach(e => assert(math.abs(e - ex) < 1e-12))
    }
    val recall = (exactSet & got.map(r => (r._1, r._2)).toSet).size.toDouble /
      exactSet.size
    assert(recall >= 0.9, s"int8 recall@5 $recall below 0.9")
  }

  test("hard negatives: cross-label only, and truly the closest cross-label vectors") {
    import org.apache.spark.sql.functions._
    val r = VectorQueries.all.find(_.name == "q97_hard_negatives").get
      .run(spark, sfDir).cache()
    // 10 probe queries x top-5 each, never the query's own label
    assert(r.count() == 50)
    assert(r.filter($"label" === $"q_label").count() == 0)
    assert(r.filter($"rnk" < 1 || $"rnk" > 5).count() == 0)
    assert(r.filter(abs($"cos_sim") > 1.0 + 1e-9).count() == 0)
    // optimality against a driver-side brute force: no cross-label
    // vector outside the returned set scores above the kept minimum
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val kept = r.select($"q_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (q, rows) =>
        q -> (rows.map(_._2).toSet, rows.map(_._3).min)
      }
    emb.filter(_._1 < 10).foreach { case (qid, qLabel, qVec) =>
      val (keptIds, keptMin) = kept(qid)
      emb.foreach { case (vid, vLabel, vec) =>
        if (vLabel != qLabel && !keptIds.contains(vid))
          assert(cos(qVec, vec) <= keptMin + 1e-9,
            s"query $qid: excluded $vid beats kept minimum $keptMin")
      }
    }
    r.unpersist()
  }

  test("label centroids: full dim coverage, uniform n, exact quantized mean") {
    import org.apache.spark.sql.functions._
    val r = VectorQueries.all.find(_.name == "q98_label_centroids").get
      .run(spark, sfDir).cache()
    assert(r.count() > 0)
    // per label: dims are exactly 0..63, and n is one constant (every
    // vector of the label contributes to every dim)
    val shape = r.groupBy($"label").agg(
      countDistinct($"dim").as("d"), min($"dim").as("lo"),
      max($"dim").as("hi"), countDistinct($"n").as("nn"))
    assert(shape.filter($"lo" =!= 0 || $"d" =!= $"hi" + 1 || $"nn" =!= 1)
      .count() == 0)
    // centroid is exactly the two final IEEE divisions of the integer sum
    assert(r.filter(
      abs($"centroid" - $"sum_q".cast("double") / $"n".cast("double") / 1000.0)
        > 0.0).count() == 0)
    // the ns across labels partition the table
    val total = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(r.filter($"dim" === 0).agg(sum($"n")).as[Long].head() == total)
    // quantization keeps the centroid within half a quantum of the true
    // float mean, per (label, dim)
    val trueMean = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"label", posexplode($"embedding").as(Seq("dim", "x")))
      .groupBy($"label", $"dim").agg(avg($"x".cast("double")).as("mu"))
    assert(r.join(trueMean, Seq("label", "dim"))
      .filter(abs($"centroid" - $"mu") > 0.0005).count() == 0)
    r.unpersist()
  }

  test("knn graph: edges stay in-bucket, scores exact, k bounded") {
    import org.apache.spark.sql.functions._
    import graft.functions.HyperplaneBucket.hyperplaneBucketFused
    val r = VectorQueries.all.find(_.name == "q102_knn_graph").get
      .run(spark, sfDir).cache()
    assert(r.count() > 0)
    assert(r.filter($"src_id" === $"dst_id").count() == 0)
    assert(r.filter($"rnk" < 1 || $"rnk" > 3).count() == 0)
    // per-src rnk is dense from 1 (window row_number)
    val perSrc = r.groupBy($"src_id")
      .agg(count(lit(1)).as("k"), max($"rnk").as("mx"))
    assert(perSrc.filter($"k" =!= $"mx").count() == 0)
    // every edge joins two vectors of the SAME LSH bucket
    val bk = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", hyperplaneBucketFused($"embedding", 8, 42).as("bkt"))
    val withB = r
      .join(bk.withColumnRenamed("vec_id", "src_id")
        .withColumnRenamed("bkt", "src_b"), "src_id")
      .join(bk.withColumnRenamed("vec_id", "dst_id")
        .withColumnRenamed("bkt", "dst_b"), "dst_id")
    assert(withB.filter($"src_b" =!= $"dst_b").count() == 0)
    // the graph contains q41's probe answers: for the 10 query vectors,
    // q41's top-3 (same buckets, same scores) must appear identically
    val q41 = VectorQueries.all.find(_.name == "q41_lsh_ann").get
      .run(spark, sfDir)
      .filter($"rnk" <= 3)
      .select($"q_id".as("src_id"), $"vec_id".as("dst_id"),
        $"cos_sim".as("expect"), $"rnk".as("expect_rnk"))
    val joined = q41.join(r, Seq("src_id", "dst_id"))
    assert(joined.count() == q41.count(), "q41 top-3 missing from knn graph")
    assert(joined.filter(abs($"cos_sim" - $"expect") > 1e-15 ||
      $"rnk" =!= $"expect_rnk").count() == 0)
    r.unpersist()
  }

  test("semantic dedup: clusters are min-canonical and match brute-force pairs") {
    import org.apache.spark.sql.functions._
    import graft.functions.HyperplaneBucket.hyperplaneBucketFused
    val r = VectorQueries.all.find(_.name == "q103_semantic_dedup").get
      .run(spark, sfDir).cache()
    assert(r.count() > 0)
    // canonical is the component minimum: never above the member, and
    // itself a clustered member flagged keeper
    assert(r.filter($"canonical_id" > $"vec_id").count() == 0)
    val canon = r.groupBy($"canonical_id").agg(min($"vec_id").as("mn"))
    assert(canon.filter($"canonical_id" =!= $"mn").count() == 0)
    assert(r.filter($"vec_id" === $"canonical_id" && $"is_keeper" =!= 1)
      .count() == 0)
    // driver-side brute force of the SAME candidate rule (bucket mates
    // with cosine >= 0.4): every pair must land in one cluster, and
    // every clustered vector must appear in some pair
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", hyperplaneBucketFused($"embedding", 8, 42).as("bkt"),
        $"embedding")
      .as[(Long, Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val pairs = for {
      (aId, aB, aV) <- emb; (bId, bB, bV) <- emb
      if aId < bId && aB == bB && cos(aV, bV) >= 0.4
    } yield (aId, bId)
    val cluster = r.select($"vec_id", $"canonical_id")
      .as[(Long, Long)].collect().toMap
    pairs.foreach { case (aId, bId) =>
      assert(cluster.get(aId).exists(c => cluster.get(bId).contains(c)),
        s"pair ($aId,$bId) not co-clustered")
    }
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(cluster.keySet == paired,
      "clustered vectors differ from pair-participating vectors")
    r.unpersist()
  }

  test("PQ ANN: shape bounded, exact re-rank scores, recall vs brute force") {
    import org.apache.spark.sql.functions._
    val exact = VectorQueries.all.find(_.name == "q39_cosine_topk").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val exactScore = exact.map(r => (r._1, r._2) -> r._3).toMap
    val got = VectorQueries.all.find(_.name == "q100_pq_ann").get
      .run(spark, sfDir)
      .select($"q_id", $"vec_id", $"approx_cos", $"cos_sim", $"rnk")
      .as[(Long, Long, Double, Double, Long)].collect()
    // 10 queries × exactly 5 candidates, never the query itself
    assert(got.length == 50)
    assert(got.forall(r => r._1 != r._2 && r._5 >= 1 && r._5 <= 5))
    // the reported exact score matches q39's exact kernel where shared
    got.foreach { case (q, v, _, ex, _) =>
      exactScore.get((q, v)).foreach(e => assert(math.abs(e - ex) < 1e-12))
    }
    // ADC score approximates the true cosine: 4 subspace centroids on
    // 16 dims lose real precision (unlike q82's int8), but the sign and
    // rough magnitude must survive — |approx − exact| bounded
    got.foreach { case (q, v, approx, ex, _) =>
      assert(math.abs(approx - ex) < 0.45,
        s"($q,$v): ADC approx=$approx vs exact=$ex")
    }
    // measured 0.20 at sf0.001 with PqK=64 — in family with the other
    // approximate methods on this near-random synthetic corpus (q41
    // single-probe 0.02, q94 multi-probe 0.14; only IVF's 27%-of-corpus
    // probes do better). Floor pinned one notch under the measurement.
    val recall = (exactSet & got.map(r => (r._1, r._2)).toSet).size.toDouble /
      exactSet.size
    info(f"PQ-ADC recall@5 vs exact: $recall%.2f")
    assert(recall >= 0.15, s"PQ recall@5 $recall below floor")
  }

  test("covariance: full upper triangle, PSD invariants, tracks float covariance") {
    import org.apache.spark.sql.functions._
    val r = VectorQueries.all.find(_.name == "q105_covariance").get
      .run(spark, sfDir).cache()
    val total = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    // 64*65/2 cells, each accumulating every vector
    assert(r.count() == 64 * 65 / 2)
    assert(r.filter($"n" =!= total).count() == 0)
    assert(r.filter($"i" > $"j" || $"i" < 0 || $"j" > 63).count() == 0)
    // diagonal variances are non-negative; off-diagonals obey
    // Cauchy-Schwarz against them
    val diag = r.filter($"i" === $"j")
      .select($"i".as("d"), $"cov".as("var")).collect()
      .map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(diag.values.forall(_ >= -1e-12))
    r.filter($"i" =!= $"j").select($"i", $"j", $"cov").collect()
      .foreach { row =>
        val (i, j, c) = (row.getInt(0), row.getInt(1), row.getDouble(2))
        assert(c * c <= diag(i) * diag(j) + 1e-9, s"($i,$j) violates C-S")
      }
    // quantization keeps each cell within ~1e-3 of the true float
    // covariance (driver-side recompute, no quantization)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"embedding").as[Array[Float]].collect()
    val n = emb.length.toDouble
    def trueCov(i: Int, j: Int): Double = {
      var sx = 0.0; var sy = 0.0; var sxy = 0.0
      emb.foreach { v =>
        sx += v(i); sy += v(j); sxy += v(i).toDouble * v(j)
      }
      sxy / n - (sx / n) * (sy / n)
    }
    Seq((0, 0), (0, 1), (7, 42), (63, 63), (31, 32)).foreach { case (i, j) =>
      val got = r.filter($"i" === i && $"j" === j)
        .select($"cov").as[Double].head()
      assert(math.abs(got - trueCov(i, j)) < 2e-3,
        s"cov($i,$j): $got vs ${trueCov(i, j)}")
    }
    r.unpersist()
  }

  test("JL projection: exact integer replay, unbiased distance estimator") {
    import org.apache.spark.sql.functions._
    val r = VectorQueries.all.find(_.name == "q106_random_projection").get
      .run(spark, sfDir).cache()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    assert(r.count() == emb.size)
    assert(r.columns.length == 17)
    // driver-side exact replay: every output component IS the quantized
    // integer sum divided by 4000
    val signs = VectorQueries.jlSigns
    r.orderBy($"vec_id").limit(5).collect().foreach { row =>
      val qv = emb(row.getLong(0))
        .map(x => math.floor(x.toDouble * 1000.0 + 0.5).toLong)
      (0 until 16).foreach { p =>
        val s = (0 until 64).map(i => qv(i) * signs(p)(i)).sum
        assert(row.getDouble(1 + p) == s.toDouble / 4000.0,
          s"vec ${row.getLong(0)} component $p")
      }
    }
    // JL property: the ±1/√k projection is an unbiased squared-distance
    // estimator (E‖R(x−y)/√k‖² = ‖x−y‖²) with relative noise ~√(2/k) =
    // 35% at k=16. The testdata's pairwise distances CONCENTRATE (cv
    // ≈ 0.12 — near-isotropic vectors), so rank correlation is
    // structurally capped low; the right invariants are the unbiased
    // MEAN ratio and χ²₁₆-bounded per-pair ratios.
    val ids = emb.keys.toSeq.sorted.take(30)
    val proj = r.filter($"vec_id".isin(ids: _*)).collect()
      .map(x => x.getLong(0) -> (1 to 16).map(x.getDouble).toArray).toMap
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    def p2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.size
    } yield p2(proj(ids(i)), proj(ids(j))) / d2(emb(ids(i)), emb(ids(j)))
    val mean = ratios.sum / ratios.size
    info(f"JL ratio over ${ratios.size} pairs: mean $mean%.3f " +
      f"min ${ratios.min}%.3f max ${ratios.max}%.3f")
    assert(mean > 0.85 && mean < 1.15, s"JL estimator biased: mean $mean")
    assert(ratios.forall(r => r > 0.15 && r < 3.5),
      s"JL ratio outside χ²₁₆ bounds: ${ratios.min} .. ${ratios.max}")
    r.unpersist()
  }

  test("PCA power iteration: unit iterate with near-maximal Rayleigh quotient") {
    import org.apache.spark.sql.functions._
    val r = VectorQueries.all.find(_.name == "q108_pca_power").get
      .run(spark, sfDir).cache()
    assert(r.count() == 64)
    val rows = r.orderBy($"i").collect()
    val v = rows.map(_.getAs[Double]("evec"))
    val eig = rows.map(_.getAs[Double]("eigval")).distinct
    assert(eig.length == 1 && eig.head > 0, s"eigval ${eig.toSeq}")
    // quantized unit norm
    val nrm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-3, s"norm $nrm")
    // Driver-side ground truth: float covariance, λ1 from a long power
    // iteration. The testdata spectrum is NEAR-ISOTROPIC (λ2/λ1 ≈ 0.93
    // at sf0.001), so six iterations cannot pinpoint ONE eigenvector —
    // the honest invariants are Rayleigh-quotient ones: RQ increases
    // monotonically under power iteration, so our iterate must score
    // well above an average direction and can never exceed λ1.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"embedding").as[Array[Float]].collect()
    val n = emb.length.toDouble
    val mean = Array.tabulate(64)(i => emb.map(_(i).toDouble).sum / n)
    val c = Array.tabulate(64, 64) { (i, j) =>
      emb.map(e => (e(i) - mean(i)) * (e(j) - mean(j))).sum / n
    }
    def rq(x: Array[Double]): Double = {
      val w = Array.tabulate(64)(i => (0 until 64).map(j => c(i)(j) * x(j)).sum)
      x.zip(w).map { case (a, b) => a * b }.sum / x.map(a => a * a).sum
    }
    var t = Array.fill(64)(1.0)
    (1 to 500).foreach { _ =>
      val w = Array.tabulate(64)(i =>
        (0 until 64).map(j => c(i)(j) * t(j)).sum)
      val wn = math.sqrt(w.map(x => x * x).sum)
      t = w.map(_ / wn)
    }
    val l1 = rq(t)
    val avgEig = (0 until 64).map(i => c(i)(i)).sum / 64.0 // trace/d
    val ours = rq(v)
    info(f"RQ(ours)=$ours%.5f λ1=$l1%.5f trace/d=$avgEig%.5f")
    // far better than an average direction, never above the optimum
    assert(ours > avgEig * 1.1, s"RQ $ours no better than average $avgEig")
    assert(ours > l1 * 0.85, s"RQ $ours too far below λ1 $l1")
    assert(ours <= l1 * 1.02, s"RQ $ours exceeds λ1 $l1")
    // the reported eigenvalue IS the Rayleigh quotient of the iterate
    // (quantization moves it by < 2%)
    assert(math.abs(eig.head - ours) / ours < 0.02,
      s"eigval ${eig.head} vs RQ $ours")
    r.unpersist()
  }

  test("z-score standardization: per-dim mean 0 / var 1, exact cell replay") {
    import org.apache.spark.sql.functions._
    val r = VectorQueries.all.find(_.name == "q110_zscore").get
      .run(spark, sfDir).cache()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    assert(r.count() == emb.size.toLong * 64)
    // standardization property, per dimension: mean ≈ 0, variance ≈ 1
    // (≈ not =: z is computed from ×1000-quantized integers, and the
    // population variance estimate itself is exact only up to the
    // quantization)
    val stats = r.groupBy($"i")
      .agg(avg($"z").as("m"), avg($"z" * $"z").as("v"))
      .collect()
    assert(stats.length == 64)
    stats.foreach { row =>
      assert(math.abs(row.getAs[Double]("m")) < 1e-9,
        s"dim ${row.getInt(0)} mean ${row.getAs[Double]("m")}")
      assert(math.abs(row.getAs[Double]("v") - 1.0) < 1e-9,
        s"dim ${row.getInt(0)} var ${row.getAs[Double]("v")}")
    }
    // exact driver replay of one vector's 64 cells through the same
    // quantize → integer stats → fixed-order IEEE pipeline
    val qAll = emb.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * 1000.0 + 0.5).toLong)
    }
    val n = qAll.size.toDouble
    val someId = qAll.keys.min
    val got = r.filter($"vec_id" === someId).orderBy($"i")
      .select($"z").as[Double].collect()
    (0 until 64).foreach { i =>
      val sx = qAll.values.map(_(i)).sum
      val sxx = qAll.values.map(v => v(i) * v(i)).sum
      val mu = sx.toDouble / n
      val sd = math.sqrt(sxx.toDouble / n - mu * mu)
      val z = (qAll(someId)(i).toDouble - mu) / sd
      assert(got(i) == z, s"dim $i: ${got(i)} vs $z")
    }
    r.unpersist()
  }

  test("abtt projection: exact zero mean, variance matches the q108 eigenvalue") {
    import org.apache.spark.sql.functions._
    val r = VectorQueries.all.find(_.name == "q112_abtt_projection").get
      .run(spark, sfDir).cache()
    val n = r.count()
    assert(n == spark.read.parquet(s"$sfDir/embeddings.parquet").count())
    val projs = r.select($"pc1_proj").as[Double].collect()
    // centering is exact in the integer domain (Σ_vectors dot = 0 by
    // construction), so the sample mean is pure double-division noise
    val mean = projs.sum / n
    assert(math.abs(mean) < 1e-9, s"mean $mean")
    // Var(proj) = v'Cv·|v|⁻²·|v|² ≈ the q108 Rayleigh-quotient eigenvalue
    // (v is the SAME quantized iterate in both queries)
    val eig = VectorQueries.all.find(_.name == "q108_pca_power").get
      .run(spark, sfDir).select($"eigval").as[Double].head()
    val varr = projs.map(p => p * p).sum / n
    assert(math.abs(varr - eig) / eig < 0.01,
      s"Var(proj) $varr vs eigval $eig")
    // the projection is a real spread (not degenerate)
    assert(projs.max > projs.min)
    r.unpersist()
  }

  test("k-center greedy: k distinct picks, non-increasing radius, true farthest-first") {
    val rows = VectorQueries.all.find(_.name == "q122_kcenter_diverse").get
      .run(spark, sfDir)
      .select($"step", $"vec_id", $"radius2").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 8)
    assert(rows.map(_._2).distinct.length == 8, "duplicate selection")
    assert(rows.head._1 == 0L && rows.head._3 == 0L)
    // greedy max-min radius is monotone non-increasing after step 1:
    // adding a center can only shrink every point's min-distance
    val radii = rows.drop(1).map(_._3)
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"radius grew: ${radii.mkString(",")}")
    }
    assert(radii.head > 0, "degenerate corpus: farthest point at distance 0")
    // independent FULL replay on the quantized grid: a driver-side
    // brute-force greedy must reproduce every round's pick and radius
    // (the spec-side twin of the oracle's CTE unroll — same decisions,
    // third implementation)
    val qvs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id",
        org.apache.spark.sql.functions.transform($"embedding",
          x => org.apache.spark.sql.functions.floor(
            x.cast("double") * 1000.0 + 0.5)).as("qv"))
      .as[(Long, Seq[Long])].collect().toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seedId = qvs.keys.min
    assert(rows.head._2 == seedId)
    var minD = (qvs - seedId).map { case (id, v) => id -> d2(qvs(seedId), v) }
    for (step <- 1 until 8) {
      val (pickId, pickD) = minD.toSeq.minBy { case (id, d) => (-d, id) }
      assert((rows(step)._2, rows(step)._3) == (pickId, pickD),
        s"step $step: got ${rows(step)}, brute-force says ($pickId, $pickD)")
      minD = (minD - pickId).map { case (id, d) =>
        id -> math.min(d, d2(qvs(pickId), qvs(id)))
      }
    }
  }
}
