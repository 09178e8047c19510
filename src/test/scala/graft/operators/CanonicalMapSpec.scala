package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted canonical-map path (q121's production shape): the
  * materialized map must replay the q121 gate query exactly, and the
  * incremental batch path must equal the full recompute on an
  * append-only, bridge-free batch — with the leakage property holding
  * on the real corpus.
  */
class CanonicalMapSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("persisted map replays q121 exactly") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val table = "canon_map_spec_full"
    CanonicalMap.write(docs, table, nBuckets = 8)
    val viaMap = CanonicalMap.assignSplits(spark, table, docs)
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"canon").as("n_clusters"),
        sum($"doc_id").as("doc_id_sum"))
      .orderBy($"split")
      .collect().map(_.toSeq).toSeq
    val gate = graft.SparkEntry.queries("q121_dedup_aware_split")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaMap == gate, s"\nmap=$viaMap\ngate=$gate")
    // bucketed-layout promise: the map side of the split-assignment
    // join reads through its doc_id bucket layout, never re-exchanged
    val probe = CanonicalMap.assignSplits(spark, table, docs)
    probe.count()
    val plan = probe.queryExecution.executedPlan
    val joins = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, s"no join in plan:\n$plan")
    val mapSide = Seq(joins.head.left, joins.head.right)
      .filter(_.toString.contains(table))
    assert(mapSide.length == 1, s"map scan not under the join:\n$plan")
    assert(collect(mapSide.head) {
      case e: ShuffleExchangeLike => e
    }.isEmpty, s"map side re-exchanged:\n$plan")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
  }

  test("incremental assignment equals the full recompute on an append-only batch") {
    // corpus: clusters {1,2} and {4,5}, solo 3; batch (larger ids, no
    // bridges, no batch-internal pairs): 11 joins cluster(1), 13 joins
    // cluster(4), 12 is unique
    val base = "the quick brown fox jumps over the lazy dog near the river bank today again"
    val other = "completely different prose about spark catalyst optimizer internals and parquet readers"
    val corpus = Seq(
      (1L, base + " one"), (2L, base + " two"), (3L, "short odd standalone text about nothing in particular with many words"),
      (4L, other + " alpha"), (5L, other + " beta")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (11L, base + " eleven"), (12L, "fully novel content that matches no admitted document at all in any shingle"),
      (13L, other + " gamma")
    ).toDF("doc_id", "text")
    val idx = "canon_map_spec_idx"
    val mapT = "canon_map_spec_map"
    val mapAll = "canon_map_spec_map_all"
    DedupIndex.write(corpus, idx, nBuckets = 4)
    CanonicalMap.write(corpus, mapT, nBuckets = 4)
    val incr = CanonicalMap.assignIncremental(spark, idx, mapT,
      corpus, batch)
    val corpusAssigned = CanonicalMap.assignSplits(spark, mapT, corpus)
    val combined = corpusAssigned.unionByName(incr)
      .collect().map(_.toSeq).toSet

    CanonicalMap.write(corpus.unionByName(batch), mapAll, nBuckets = 4)
    val full = CanonicalMap.assignSplits(spark, mapAll,
        corpus.unionByName(batch))
      .collect().map(_.toSeq).toSet
    assert(combined == full, s"\nincr=$combined\nfull=$full")
    // the batch docs actually exercised inheritance (not all solo)
    val canons = incr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canons(11L) == 1L, s"11 must inherit cluster(1): $canons")
    assert(canons(13L) == 4L, s"13 must inherit cluster(4): $canons")
    assert(canons(12L) == 12L, s"12 must be its own canonical: $canons")
    Seq(idx, mapT, mapAll).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("leakage property on the real corpus: verified pairs never straddle splits (absent bridges)") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val isNew = $"doc_id" >= 250
    val corpus = docs.filter(!isNew)
    val batch = docs.filter(isNew)
    val idx = "canon_map_leak_idx"
    val mapT = "canon_map_leak_map"
    DedupIndex.write(corpus, idx, nBuckets = 8)
    CanonicalMap.write(corpus, mapT, nBuckets = 8)
    val incr = CanonicalMap.assignIncremental(spark, idx, mapT,
      corpus, batch)
    val corpusSplit = CanonicalMap.assignSplits(spark, mapT, corpus)
    // every verified new↔corpus pair whose new doc did NOT bridge
    // multiple corpus clusters must share a split with its partner
    val verified = DedupQueries.verifyCandidates(
        DedupIndex.probeCandidates(spark, idx, batch), batch, corpus)
      .filter($"jaccard" >= 0.8)
    val partnerCanon = verified
      .join(spark.table(mapT)
          .select($"doc_id".as("corpus_id"), $"canonical_id"),
        Seq("corpus_id"), "left")
      .select($"new_id", $"corpus_id",
        coalesce($"canonical_id", $"corpus_id").as("pc"))
    val bridges = partnerCanon.groupBy($"new_id")
      .agg(countDistinct($"pc").as("nc")).filter($"nc" > 1)
      .select($"new_id").as[Long].collect().toSet
    val straddling = verified
      .join(incr.select($"doc_id".as("new_id"), $"split".as("s_new")),
        Seq("new_id"))
      .join(corpusSplit.select($"doc_id".as("corpus_id"),
          $"split".as("s_old")),
        Seq("corpus_id"))
      .filter($"s_new" =!= $"s_old")
      .select($"new_id").as[Long].collect().toSet
    assert(verified.count() > 0, "fixture should contain real near-dups")
    assert((straddling -- bridges).isEmpty,
      s"non-bridge docs leaked across splits: ${straddling -- bridges}")
    Seq(idx, mapT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }
}
