package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface registered by GraftExtensions must agree with the
  * DataFrame-API column functions — a SQL-only consumer of the library
  * sees the same operators.
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // limit AFTER a unique orderBy: a bare GlobalLimit over a multi-split
  // scan picks an arbitrary subset, and the SQL and API paths below each
  // re-execute the plan — unordered limits could hand them different rows
  private lazy val docs = {
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .orderBy("doc_id").limit(50).createOrReplaceTempView("ext_docs")
    spark.table("ext_docs")
  }

  private lazy val emb = {
    graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .orderBy("vec_id").limit(50).createOrReplaceTempView("ext_emb")
    spark.table("ext_emb")
  }

  test("text functions are callable from SQL and match the API") {
    docs // force view registration
    val viaSql = spark.sql("""
      SELECT doc_id, poly_hash(text) AS ph, simhash61(text) AS sh,
             size(shingles(text, 3)) AS nsh,
             text_stats(text).n_tokens AS nt, lang_id(text) AS lang
      FROM ext_docs ORDER BY doc_id""").collect()
    val viaApi = docs.select($"doc_id",
      PolyHash.polyHash($"text").as("ph"),
      SimHash61.simhash($"text").as("sh"),
      org.apache.spark.sql.functions.size(
        Shingles.shingles($"text", 3)).as("nsh"),
      TextFunctions.textStats($"text").getField("n_tokens").as("nt"),
      TextFunctions.langIdFused($"text").as("lang"))
      .orderBy($"doc_id").collect()
    assert(viaSql.map(_.toSeq).toSeq == viaApi.map(_.toSeq).toSeq)
  }

  test("vector functions are callable from SQL and match the API") {
    emb
    val viaSql = spark.sql("""
      SELECT vec_id, cosine_sim(embedding, embedding) AS self_cos,
             hyperplane_bucket(embedding, 8, 42) AS bucket
      FROM ext_emb ORDER BY vec_id""").collect()
    val viaApi = emb.select($"vec_id",
      CosineSim.cosineFused($"embedding", $"embedding").as("self_cos"),
      HyperplaneBucket.hyperplaneBucketFused($"embedding", 8, 42).as("bucket"))
      .orderBy($"vec_id").collect()
    assert(viaSql.map(_.toSeq).toSeq == viaApi.map(_.toSeq).toSeq)
    // self-cosine is 1 up to fp rounding
    viaApi.foreach { r =>
      assert(math.abs(r.getAs[Double]("self_cos") - 1.0) < 1e-9)
    }
  }

  test("round-3 functions are callable from SQL and match the API") {
    docs
    val (a, b) = (Affine61.mixA, Affine61.mixB)
    val viaSql = spark.sql(s"""
      SELECT doc_id,
             nfc_normalize(text || ' été') AS nfc,
             strip_accents(text || ' été') AS plain,
             affine61(doc_id, ${a}L, ${b}L) AS h,
             math_ln(CAST(doc_id + 1 AS DOUBLE)) AS lg
      FROM ext_docs ORDER BY doc_id""").collect()
    val decorated = org.apache.spark.sql.functions.concat(
      $"text", org.apache.spark.sql.functions.lit(" été"))
    val viaApi = docs.select($"doc_id",
      UnicodeNorm.nfcNormalize(decorated).as("nfc"),
      UnicodeNorm.stripAccentsCol(decorated).as("plain"),
      Affine61.affine61($"doc_id", a, b).as("h"),
      MathLn.ln(($"doc_id" + 1).cast("double")).as("lg"))
      .orderBy($"doc_id").collect()
    assert(viaSql.map(_.toSeq).toSeq == viaApi.map(_.toSeq).toSeq)
  }

  test("round-6 functions are callable from SQL and match the API") {
    docs
    val viaSql = spark.sql("""
      SELECT doc_id,
             simhash_features(shingles(text, 3)) AS shf,
             poly_hash61(text) AS ph61
      FROM ext_docs ORDER BY doc_id""").collect()
    val viaApi = docs.select($"doc_id",
      SimHashFeatures.simhashFeatures(Shingles.shingles($"text", 3)).as("shf"),
      PolyHash61Str.polyHash61Str($"text").as("ph61"))
      .orderBy($"doc_id").collect()
    assert(viaSql.map(_.toSeq).toSeq == viaApi.map(_.toSeq).toSeq)
  }

  test("cosine_sim rejects non-float arrays at analysis instead of misreading them") {
    // array(1.0, 2.0) is array<double>; getFloat over 8-byte slots would
    // silently return garbage without the ExpectsInputTypes guard
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(array(1.0D, 2.0D), array(1.0D, 2.0D))")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
