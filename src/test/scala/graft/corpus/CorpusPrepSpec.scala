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
      "exact_dedup", "near_dedup", "span_dedup", "decontaminate", "mix",
      "pack"))
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

  test("no exact >=50-token shared span survives the span_dedup stage") {
    // removing every flagged doc leaves zero cross-span pairs by the
    // first-wins argument in CorpusPrep's stage comment — assert it
    val flags = DedupQueries.exactSubstringFlags(
      prepared.select($"doc_id", $"text"))
    assert(flags.filter($"is_exact_dup" === 1).count() == 0)
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

  test("clean corpus (zero near-dup pairs) runs end-to-end") {
    // regression: a corpus with NO verified near-dup pairs at the
    // threshold drives DedupCluster.resolve with an empty edge set —
    // the path that NPE'd before round 4. Every doc must survive
    // near-dedup and the pipeline must complete.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "web"),
      (2L, "one two three four five six seven eight nine ten eleven", "web"),
      (3L, "spark catalyst optimizer rewrites logical plans into physical", "books"),
      (4L, "entirely unrelated sentence about mountains rivers and weather", "books")
    ).toDF("doc_id", "text", "source")
    val (out, counts) = CorpusPrep.run(docs, None,
      CorpusPrepConfig(minQuality = 0.0))
    val byStage = counts.map(c => c.stage -> c.rows).toMap
    assert(byStage("near_dedup") == byStage("exact_dedup"),
      "clean corpus: near-dedup must drop nothing")
    assert(out.count() == 4)
    assert(out.columns.contains("chunk_id") && out.columns.contains("split"))
  }

  test("near-dedup keeps the higher-quality copy, not the lower id") {
    // two near-dups (3-shingle jaccard ≈ 0.86): the junk-decorated copy
    // has the LOWER id, so min-id resolution would keep the wrong one —
    // keep-best must retain the clean higher-id copy
    val clean = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val junky = clean + " #### $$$$"
    val docs = Seq(
      (5L, junky, "web"),
      (10L, clean, "web"),
      (20L, "completely unrelated filler text about mountains rivers weather and stars", "web")
    ).toDF("doc_id", "text", "source")
    val (out, counts) = CorpusPrep.run(docs, None,
      CorpusPrepConfig(minQuality = 0.0))
    val byStage = counts.map(c => c.stage -> c.rows).toMap
    assert(byStage("near_dedup") == 2, counts.mkString(", "))
    val survivors = out.select($"doc_id").as[Long].collect().toSet
    assert(survivors == Set(10L, 20L),
      s"expected the clean copy (10) to survive, got $survivors")
  }

  test("packing matches an independent sequential re-implementation") {
    // packing windows by (source, split) — re-implement per that key
    val got = prepared
      .select($"source", $"split", $"doc_id", $"n_tok", $"chunk_id")
      .as[(String, String, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
    got.foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._3).foreach { case (_, _, _, tok, chunk) =>
        assert(chunk == cum / 1024L)
        cum += tok
      }
    }
    // chunks start at 0 and are contiguous per (source, split)
    got.foreach { case (key, rows) =>
      val ids = rows.map(_._5).distinct.sorted.toSeq
      assert(ids == (0L until ids.length), s"$key: $ids")
    }
  }

  test("no chunk spans two splits — the property split-aware packing guarantees") {
    // Before the round-4 fix the packing window partitioned by source only,
    // so one cumulative token sum ran across split boundaries and a single
    // chunk could mix train and eval docs. Pin the fixed semantics:
    // every (source, split) restarts numbering at chunk 0 — under the
    // old per-source window, only the split holding a source's first docs
    // could contain chunk 0.
    val starts = prepared.groupBy($"source", $"split")
      .agg(min($"chunk_id").as("first_chunk"))
    assert(starts.filter($"first_chunk" =!= 0).count() == 0)
    // (the full same-split cumulative-sum recompute lives in the
    // "independent sequential re-implementation" test above — it already
    // groups by (source, split), so repeating it here would maintain the
    // same oracle twice)
  }
}
