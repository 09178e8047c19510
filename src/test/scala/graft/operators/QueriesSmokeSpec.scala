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

  // r8: the byte-folding oracles (q90 entropy, q32 PolyHash, the
  // MinHash/SimHash family) are BYTE-TRUE — hex(encode(..)) pairs, not
  // ord()-per-char — so the gate survives non-ASCII testdata instead of
  // assuming char = byte. DuckDB-side parity on non-ASCII is proven by
  // tools/nonascii_gate.sh (fixture -> Verify -> check.py; 13/13 pass,
  // recorded in COVERAGE.md); HERE we prove the Spark side of the same
  // contract on the same fixture: every byte-sensitive query runs over
  // documents where char != byte, and q90/q32 outputs equal an
  // independent JVM byte-fold reference.
  test("byte-sensitive queries run and match JVM byte folds on non-ASCII text") {
    import org.apache.spark.sql.functions._
    val fixDir = "target/test-nonascii/sf"
    val n = graft.tools.NonAsciiFixture.write(spark, sfDir, fixDir)
    assert(n > 0)
    graft.tools.NonAsciiFixture.ByteSensitive.foreach { name =>
      assert(SparkEntry.queries(name)(spark, fixDir).count() > 0,
        s"$name returned 0 rows on the non-ASCII fixture")
    }
    // Independent reference folds over getBytes("UTF-8") — same bytes
    // the DuckDB oracle now decodes from hex(encode(text)).
    val docs = spark.read.parquet(s"$fixDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def refEntropy(t: String): Long = {
      val bytes = t.getBytes("UTF-8")
      val counts = new Array[Int](256)
      bytes.foreach(b => counts(b & 0xff) += 1)
      val nn = bytes.length.toDouble
      var s = 0.0
      for (b <- 0 until 256 if counts(b) > 0) {
        val p = counts(b) / nn
        s += p * Math.log(p)
      }
      val e = if (s == 0.0) 0.0 else -s
      math.floor(e * 1e4).toLong * 100
    }
    def refPoly(t: String): Long = {
      var h = 0L
      t.getBytes("UTF-8").foreach(b => h = h * graft.functions.PolyHash.Base + (b & 0xff))
      h
    }
    SparkEntry.queries("q90_char_entropy")(spark, fixDir)
      .select("doc_id", "entropy_unat").collect().foreach { r =>
        assert(r.getLong(1) == refEntropy(docs(r.getLong(0))),
          s"q90 mismatch on doc ${r.getLong(0)}")
      }
    SparkEntry.queries("q32_fingerprints")(spark, fixDir)
      .select("doc_id", "fingerprint").collect().foreach { r =>
        assert(r.getLong(1) == refPoly(docs(r.getLong(0))),
          s"q32 mismatch on doc ${r.getLong(0)}")
      }
  }
}
