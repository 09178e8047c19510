package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DedupClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chains, stars, and singletons resolve to component minima") {
    // components: {1,2,3,4} chain, {10,11,12} star on 10, {20,21} pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (20L, 21L)).toDF("a_id", "b_id")
    val got = DedupCluster.resolve(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("zero-edge input resolves to an empty mapping (clean corpus)") {
    // regression: before round 4 an empty edge set entered the label-
    // propagation loop, where sum(label) over zero rows is a null DECIMAL
    // and labelSum NPE'd — a clean corpus crashed the flagship pipeline
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val got = DedupCluster.resolve(empty)
    assert(got.columns.toSeq == Seq("id", "canonical_id"))
    assert(got.count() == 0)
  }

  test("keepers on zero pairs: everyone keeps themselves") {
    val all = Seq(1L, 2L, 3L).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val got = DedupCluster.keepers(all, none).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("keepers: unpaired docs keep themselves") {
    val all = Seq(1L, 2L, 3L, 99L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val got = DedupCluster.keepers(all, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 99L -> 99L))
  }

  test("end-to-end: LSH pairs from the corpus cluster cleanly") {
    val lsh = DedupQueries.all.find(_.name == "q36_minhash_lsh_pairs").get
      .run(spark, "/root/testdata/sf0.001")
      .filter($"jaccard" >= 0.8)
      .select($"a_id", $"b_id")
    val resolved = DedupCluster.resolve(lsh).as[(Long, Long)].collect()
    assert(resolved.nonEmpty)
    // canonical ids are component minima: every canonical is ≤ its member
    resolved.foreach { case (id, c) => assert(c <= id) }
    // and canonicals are themselves mapped to themselves
    val m = resolved.toMap
    m.values.toSet.foreach((c: Long) => assert(m(c) == c))
  }

  test("q121 dedup-aware split has structurally zero leakage; q120 measures the doc-id split") {
    val sfDir = "/root/testdata/sf0.001"
    // Every verified near-dup pair shares a canonical id, hence a split:
    // label both endpoints of the q70 edge set with the q121 rule
    // (split of the canonical) and assert no pair straddles a boundary.
    val pairs = DedupQueries.lshVerifiedPairs(
        graft.Tables.load(spark, sfDir, "documents"))
      .filter($"jaccard" >= 0.8).select($"a_id", $"b_id")
    val canon = DedupCluster.resolve(pairs)
      .select($"id", $"canonical_id")
    def splitOf(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.functions.when(c % 10 < 8, "train")
        .when(c % 10 === 8, "val").otherwise("test")
    val leaked = pairs
      .join(canon.select($"id".as("a_id"), $"canonical_id".as("ca")), Seq("a_id"))
      .join(canon.select($"id".as("b_id"), $"canonical_id".as("cb")), Seq("b_id"))
      .filter(splitOf($"ca") =!= splitOf($"cb"))
      .count()
    assert(leaked == 0L)
    // q120's grouped output is consistent: summing n_pairs over its rows
    // equals the verified pair count, and doc-id splits CAN leak (the
    // is_leak rows are exactly the split_a != split_b rows).
    val q120 = DedupQueries.all.find(_.name == "q120_split_leakage").get
      .run(spark, sfDir).collect()
    val nPairs = q120.map(_.getAs[Long]("n_pairs")).sum
    assert(nPairs == pairs.count())
    q120.foreach { r =>
      val leak = r.getAs[String]("split_a") != r.getAs[String]("split_b")
      assert(r.getAs[Int]("is_leak") == (if (leak) 1 else 0))
    }
    // q121 partitions the corpus: per-split doc counts sum to the corpus
    val q121 = DedupQueries.all.find(_.name == "q121_dedup_aware_split").get
      .run(spark, sfDir).collect()
    val corpus = graft.Tables.load(spark, sfDir, "documents").count()
    assert(q121.map(_.getAs[Long]("n_docs")).sum == corpus)
  }
}
