package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed band index must deliver its scale promise MECHANICALLY:
  * the probe join's physical plan shuffles only the new-batch side
  * (the corpus-sized index scan has no exchange above it), and the
  * probe finds exactly the candidates the stateless recompute finds.
  */
class DedupIndexSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val table = "dedup_band_index_spec"

  private def docs = Tables.load(spark, sfDir, "documents")
    .select($"doc_id", $"text")
  private def isNew = $"doc_id" % 3 === 2

  test("probe plan: index side is never exchanged, bucketed scan in effect") {
    DedupIndex.write(docs.filter(!isNew), table, nBuckets = 8)
    val probe = DedupIndex.probeCandidates(spark, table, docs.filter(isNew))
    probe.count() // let AQE finalize the real plan
    val plan = probe.queryExecution.executedPlan
    // the corpus-sized index is read via its bucket layout...
    assert(plan.toString.contains("Bucketed: true") &&
      plan.toString.contains("SelectedBucketsCount"),
      s"bucketed read not in effect:\n${plan.toString.take(1200)}")
    // ...and BETWEEN the index scan and the join there is no exchange:
    // the join's index-side child subtree must be shuffle-free (the
    // batch side may broadcast — as it does for a small batch — or
    // shuffle; either way the index never moves)
    val joins = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, s"no join in plan:\n$plan")
    val join = joins.head
    val indexSide = Seq(join.left, join.right)
      .filter(_.toString.contains(table))
    assert(indexSide.length == 1, s"index scan not under the join:\n$plan")
    val indexShuffles = collect(indexSide.head) {
      case e: ShuffleExchangeLike => e
    }
    assert(indexShuffles.isEmpty, s"index side re-exchanged:\n$plan")
  }

  test("probe candidates equal the stateless-recompute candidates") {
    val viaIndex = DedupIndex.probeCandidates(spark, table, docs.filter(isNew))
      .as[(Long, Long)].collect().toSet
    val fresh = DedupQueries.bandIndex(docs.filter(isNew))
      .select($"band", $"bucket", $"doc_id".as("new_id"))
    val corpus = DedupQueries.bandIndex(docs.filter(!isNew))
      .select($"band", $"bucket", $"doc_id".as("corpus_id"))
    val recomputed = fresh.join(corpus, Seq("band", "bucket"))
      .select($"new_id", $"corpus_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(viaIndex == recomputed && viaIndex.nonEmpty)
  }
}
