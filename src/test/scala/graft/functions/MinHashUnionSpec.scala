package graft.functions

import graft.TestSpark
import graft.functions.TextFunctions.shingleSet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The union-sketch property that makes MinHash mergeable:
  * `sig(A ∪ B) = min(sig(A), sig(B))` — so the aggregate of per-doc
  * signatures must equal the signature of the pooled shingle set,
  * independent of partitioning (partial aggregation correctness).
  */
class MinHashUnionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 32

  private lazy val docs = graft.Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .select($"doc_id", ($"doc_id" % 7).as("grp"),
      shingleSet($"text", 3).as("sh"))

  test("aggregated signature equals the signature of the pooled shingle set") {
    val perDoc = docs.select($"grp",
      MinHashSig.minhashSig($"sh", K).as("sig"))
    val agged = perDoc.groupBy($"grp")
      .agg(MinHashUnion.minhashUnion($"sig", K).as("union_sig"))

    // oracle: pool each group's shingles, then one signature of the set
    val pooled = docs.select($"grp", explode($"sh").as("s"))
      .groupBy($"grp").agg(collect_set($"s").as("pooled"))
      .select($"grp", MinHashSig.minhashSig($"pooled", K).as("oracle_sig"))

    val joined = agged.join(pooled, "grp")
      .select($"grp", $"union_sig", $"oracle_sig").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"group ${r.get(0)}: union sketch != pooled signature")
    }
  }

  test("result is partitioning-independent (partial aggregation is sound)") {
    def run(parts: Int) = docs
      .repartition(parts)
      .select($"grp", MinHashSig.minhashSig($"sh", K).as("sig"))
      .groupBy($"grp")
      .agg(MinHashUnion.minhashUnion($"sig", K).as("u"))
      .orderBy($"grp")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(run(1) == run(7))
  }

  test("empty groups keep the MaxValue sentinel") {
    val empty = Seq((1L, Array.empty[Long].toSeq)).toDF("grp", "sig")
      .filter($"grp" < 0) // no rows
    val out = empty.groupBy($"grp")
      .agg(MinHashUnion.minhashUnion($"sig", K))
    assert(out.count() == 0) // no groups at all — nothing to sketch
  }
}
