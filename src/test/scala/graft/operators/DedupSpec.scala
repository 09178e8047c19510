package graft.operators

import graft.TestSpark
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("LSH candidates contain every high-jaccard pair found exactly (recall)") {
    // ground truth: exact all-pairs jaccard >= 0.8
    val exact = DedupQueries.all.find(_.name == "q35_jaccard_topk").get
      .run(spark, sfDir)
      .filter($"jaccard" >= 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val lsh = DedupQueries.all.find(_.name == "q36_minhash_lsh_pairs").get
      .run(spark, sfDir)
      .filter($"jaccard" >= 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain at least one near-dup pair")
    assert(exact.subsetOf(lsh),
      s"LSH missed pairs: ${exact -- lsh}")
  }

  test("short docs (< k tokens) produce no band keys and flood no candidates") {
    // regression for the round-4 sentinel fix: docs too short to shingle
    // used to carry the identical Long.MaxValue sentinel signature, so
    // every such doc collided with every other in ALL bands — a candidate
    // flood quadratic in the short-doc count. They must now be excluded
    // from banding entirely.
    val docs = Seq(
      (1L, "hi"), (2L, "ok"), (3L, "a b"), // all < 3 tokens: no shingles
      (4L, "the quick brown fox jumps over the lazy dog by the river"),
      (5L, "the quick brown fox jumps over the lazy dog by the riverside")
    ).toDF("doc_id", "text")
    val bands = DedupQueries.bandIndex(docs)
    assert(bands.filter($"doc_id".isin(1L, 2L, 3L)).count() == 0,
      "short docs must emit no band keys")
    assert(bands.filter($"doc_id".isin(4L, 5L)).count() > 0)
    // verified pairs only ever involve shingle-bearing docs
    val pairs = DedupQueries.lshVerifiedPairs(docs)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a >= 4L && b >= 4L },
      s"sentinel pair leaked: ${pairs.mkString(",")}")
  }

  test("simhash: identical texts get identical signatures, edits stay close") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bend today"),
      (4L, "completely different words about spark catalyst optimizer internals")
    ).toDF("doc_id", "text")
    val sigs = df
      .select($"doc_id", graft.functions.SimHash61.simhash($"text").as("sh"))
      .as[(Long, Long)].collect().toMap

    assert(sigs(1L) == sigs(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)))
  }

  test("minhash signature is stable across partitionings (determinism)") {
    val q = DedupQueries.all.find(_.name == "q34_minhash_signatures").get
    val a = q.run(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = q.run(spark, sfDir).repartition(7).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("keep-best: one keeper per cluster, argmax quality, q70 membership") {
    val r = DedupQueries.all.find(_.name == "q85_keep_best").get
      .run(spark, sfDir).cache()
    val q70 = DedupQueries.all.find(_.name == "q70_dedup_resolve").get
      .run(spark, sfDir)
    // q85 re-ranks q70's clusters — identical membership and grouping
    val m85 = r.select($"doc_id", $"cluster_id")
      .as[(Long, Long)].collect().toMap
    val m70 = q70.select($"doc_id", $"canonical_id")
      .as[(Long, Long)].collect().toMap
    assert(m85.nonEmpty && m85 == m70)
    val rows = r.select($"doc_id", $"cluster_id", $"quality", $"is_kept")
      .as[(Long, Long, Double, Int)].collect()
    rows.groupBy(_._2).foreach { case (cid, g) =>
      assert(g.length >= 2, s"cluster $cid has a single member")
      // the unique keeper is max-quality, tie broken by smaller doc_id
      val best = g.minBy(x => (-x._3, x._1))
      g.foreach { x =>
        assert((x._4 == 1) == (x._1 == best._1),
          s"cluster $cid: keeper should be ${best._1}")
      }
    }
    r.unpersist()
  }
}
