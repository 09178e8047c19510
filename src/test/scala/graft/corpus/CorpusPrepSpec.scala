package graft.corpus

import graft.{Tables, TestSpark}
import graft.operators.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed pipeline's invariants. Each stage's VALUES are already
  * gate-verified through its registry twin (q72/q30/q33/q36+q70/q50/
  * q73/q45/q74); here we verify the composition: stage accounting,
  * end-state properties (no near-dups survive, no contamination
  * survives), and the packing arithmetic against an independent
  * re-implementation.
  */
class CorpusPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val (prepared, counts) = {
    val docs = Tables.load(spark, sfDir, "documents")
    val eval_ = docs.filter($"doc_id" % 20 === 0).select($"doc_id", $"text")
    CorpusPrep.run(docs, Some(eval_))
  }

  test("stage accounting: monotone, complete, normalization lossless") {
    val byStage = counts.map(c => c.stage -> c.rows).toMap
    assert(counts.map(_.stage) == Seq("input", "normalize", "quality_gate",
      "exact_dedup", "near_dedup", "decontaminate", "mix", "pack"))
    assert(byStage("input") == 500)
    assert(byStage("normalize") == byStage("input"))
    counts.sliding(2).foreach {
      case Seq(a, b) => assert(b.rows <= a.rows, s"${b.stage} grew")
      case _ =>
    }
    // mix disabled and packing only annotates: no rows move
    assert(byStage("mix") == byStage("decontaminate"))
    assert(byStage("pack") == byStage("mix"))
  }

  test("no verified near-duplicate pair survives resolution") {
    val remaining = DedupQueries.lshVerifiedPairs(
      prepared.select($"doc_id", $"text"))
      .filter($"jaccard" >= 0.8)
    assert(remaining.count() == 0)
  }

  test("no surviving doc shares an n-gram with the eval set") {
    val docs = Tables.load(spark, sfDir, "documents")
    val evalSh = docs.filter($"doc_id" % 20 === 0)
      .select(explode(graft.functions.Shingles.shingles($"text", 5)).as("sh"))
      .distinct()
    val survivors = prepared.select($"doc_id",
      explode(graft.functions.Shingles.shingles($"text", 5)).as("sh"))
    assert(survivors.join(evalSh, Seq("sh")).count() == 0)
    // in particular every in-corpus eval doc was dropped (self-overlap)
    assert(prepared.filter($"doc_id" % 20 === 0).count() == 0)
  }

  test("split labels are total and roughly proportioned") {
    val n = prepared.count().toDouble
    val frac = prepared.groupBy($"split").count().as[(String, Long)]
      .collect().toMap.view.mapValues(_ / n).toMap
    assert(frac.keySet == Set("train", "val", "test"))
    assert(math.abs(frac("train") - 0.8) < 0.1, frac)
  }

  test("packing matches an independent sequential re-implementation") {
    val got = prepared
      .select($"source", $"doc_id", $"n_tok", $"chunk_id")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1)
    got.foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, _, tok, chunk) =>
        assert(chunk == cum / 1024L)
        cum += tok
      }
    }
    // chunks start at 0 and are contiguous per source
    got.foreach { case (src, rows) =>
      val ids = rows.map(_._4).distinct.sorted.toSeq
      assert(ids == (0L until ids.length), s"$src: $ids")
    }
  }
}
