package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs at sf0.001 and returns rows with
  * the declared schema. Oracle equivalence is enforced by the driver's
  * DuckDB compare (tools/check.py locally).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows at sf0.001")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle without query: $unknown")
  }

  // The q90 oracle histograms per-CHARACTER ord() while ByteEntropy
  // histograms UTF-8 BYTES, and q32's oracle replays the byte fold with
  // ord() — parity holds only while documents.text is pure ASCII (where
  // char = byte). That coupling was previously only a scaladoc remark;
  // this pins it at gate time for every local scale, so the first
  // non-ASCII document fails HERE with a named cause instead of
  // silently turning the driver's hash gate red.
  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"documents.text is pure ASCII at $sf (q90/q32 oracle precondition)") {
      import org.apache.spark.sql.functions._
      val nonAscii = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
        .filter(octet_length(col("text")) =!= length(col("text")))
        .count()
      assert(nonAscii == 0,
        s"$nonAscii non-ASCII documents at $sf — q90/q32 oracles assume char=byte")
    }
  }
}
