package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted exact-substring fingerprint index must deliver the
  * DedupIndex promises for q128's tier: the probe shuffles only the
  * new-batch side (the index reads through its bucket layout), the
  * probe finds exactly the stateless-recompute candidates, and the
  * incremental flags agree with the standalone q128 dataflow on the
  * new-vs-corpus restriction.
  */
class SpanIndexSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val table = "span_index_spec"

  private def docs = Tables.load(spark, sfDir, "documents")
    .select($"doc_id", $"text")
  private def isNew = $"doc_id" >= 250

  test("probe plan: index side is never exchanged, bucketed scan in effect") {
    SpanIndex.write(docs.filter(!isNew), table, nBuckets = 8)
    val probe = SpanIndex.probeCandidates(spark, table, docs.filter(isNew))
    probe.count()
    val plan = probe.queryExecution.executedPlan
    assert(plan.toString.contains("Bucketed: true") &&
      plan.toString.contains("SelectedBucketsCount"),
      s"bucketed read not in effect:\n${plan.toString.take(1200)}")
    val joins = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, s"no join in plan:\n$plan")
    val indexSide = Seq(joins.head.left, joins.head.right)
      .filter(_.toString.contains(table))
    assert(indexSide.length == 1, s"index scan not under the join:\n$plan")
    assert(collect(indexSide.head) {
      case e: ShuffleExchangeLike => e
    }.isEmpty, s"index side re-exchanged:\n$plan")
  }

  test("probe candidates equal the stateless-recompute candidates") {
    val viaIndex = SpanIndex.probeCandidates(spark, table, docs.filter(isNew))
      .as[(Long, Long)].collect().toSet
    val fresh = SpanIndex.fingerprints(docs.filter(isNew))
      .select($"fp", $"doc_id".as("new_id"))
    val corpus = SpanIndex.fingerprints(docs.filter(!isNew))
      .select($"fp", $"doc_id".as("corpus_id"))
    val recomputed = fresh.join(corpus, Seq("fp"))
      .select($"new_id", $"corpus_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(viaIndex == recomputed)
    assert(viaIndex.nonEmpty, "fixture should produce span candidates")
  }

  test("incremental flags equal the standalone q128 dataflow on new-vs-corpus pairs") {
    // the standalone q128 run over the FULL corpus, restricted to new
    // docs whose dup_of is an admitted (corpus-side) doc, must equal
    // the incremental result — batch-internal pairs are excluded from
    // both sides of the comparison (q71's new-vs-corpus convention)
    val incr = SpanIndex.flagIncremental(spark, table,
        docs.filter(!isNew), docs.filter(isNew))
      .as[(Long, Long, Int, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // reference: candidates + verify restricted to (corpus, new) pairs
    val cand = SpanIndex.probeCandidates(spark, table, docs.filter(isNew))
    val ref = cand
      .join(docs.filter(isNew).select($"doc_id".as("new_id"),
        $"text".as("b_text")), Seq("new_id"))
      .join(docs.filter(!isNew).select($"doc_id".as("corpus_id"),
        $"text".as("a_text")), Seq("corpus_id"))
      .filter(graft.functions.SharedSpan.sharedSpan($"a_text", $"b_text",
        DedupQueries.SpanTokens))
      .groupBy($"new_id").agg(min($"corpus_id").as("dup_of"))
      .as[(Long, Long)].collect().toMap
    assert(ref.nonEmpty, "fixture should contain real cross-boundary spans")
    docs.filter(isNew).select($"doc_id").as[Long].collect().foreach { id =>
      val (_, flag, dupOf) = incr(id)
      ref.get(id) match {
        case Some(d) => assert(flag == 1 && dupOf == d, s"doc $id")
        case None => assert(flag == 0 && dupOf == -1L, s"doc $id")
      }
    }
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
  }

  test("eval-index decontamination: incremental equals full q132 on an append-only batch") {
    // q132's split convention: eval = doc_id % 20 == 0. Index the EVAL
    // side (it rarely changes); the batch is a train-doc slice. Because
    // decontamination is train-vs-eval ONLY (no batch-internal pairs
    // exist by definition), the incremental result must equal the full
    // q132 recompute restricted to the batch's docs — for ANY batch,
    // with no new-vs-corpus restriction caveat.
    val evalTable = "span_index_eval_spec"
    val isEval = $"doc_id" % 20 === 0
    val inBatch = $"doc_id" >= 250 && !($"doc_id" % 20 === 0)
    SpanIndex.writeEvalIndex(docs.filter(isEval), evalTable, nBuckets = 8)
    val incr = SpanIndex.decontaminateIncremental(spark, evalTable,
        docs.filter(isEval), docs.filter(inBatch))
    // probe plan: the persisted eval side reads through its bucket
    // layout, never re-exchanged — only the batch shuffles
    val cand = spark.table(evalTable)
      .select($"fp", $"doc_id".as("e_id"))
      .join(SpanIndex.fingerprints(docs.filter(inBatch),
          TrainingQueries.DecontamGramK, TrainingQueries.DecontamWinnowW)
        .select($"fp", $"doc_id".as("t_id")), Seq("fp"))
    cand.count()
    val plan = cand.queryExecution.executedPlan
    // a benchmark-sized eval index BROADCASTS (zero shuffle on either
    // side — the ideal small-eval plan); a huge one reads through its
    // bucket layout. Either way the index side is never
    // shuffle-exchanged and the probe cost stays O(batch).
    assert(plan.toString.contains("Bucketed: true")
        || plan.toString.contains("BroadcastExchange"),
      s"neither bucketed read nor broadcast in effect:\n${plan.toString.take(1200)}")
    val joins = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    val indexSide = Seq(joins.head.left, joins.head.right)
      .filter(_.toString.contains(evalTable))
    assert(indexSide.length == 1, s"eval scan not under the join:\n$plan")
    assert(collect(indexSide.head) {
      case e: ShuffleExchangeLike => e
    }.isEmpty, s"eval index side re-exchanged:\n$plan")
    // value parity vs the full gate query
    val full = TrainingQueries.all.find(_.name == "q132_span_decontaminate")
      .get.run(spark, sfDir)
      .filter($"doc_id" >= 250)
      .as[(Long, Long, Long, Double, Int)].collect().toSeq.sortBy(_._1)
    val got = incr.as[(Long, Long, Long, Double, Int)]
      .collect().toSeq.sortBy(_._1)
    assert(full.nonEmpty && got == full,
      s"incremental != full: ${got.diff(full).take(3)} vs ${full.diff(got).take(3)}")
    assert(full.exists(_._3 > 0),
      "fixture should contain real train-eval span overlap")
    spark.sql(s"DROP TABLE IF EXISTS `$evalTable`")
  }
}
