package graft.functions

import graft.TestSpark
import graft.functions.TextFunctions.shingleSet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-registered custom expressions (GraftExtensions) behave exactly
  * like their Column-API forms, and MinHashSig keeps the MinHash
  * similarity property.
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("poly_hash is callable from SQL and equals the Column API") {
    Seq("alpha", "beta").toDF("t").createOrReplaceTempView("ph_in")
    val sql = spark.sql("SELECT poly_hash(t) AS h FROM ph_in ORDER BY t")
      .as[Long].collect().toSeq
    val api = Seq("alpha", "beta").toDF("t").orderBy($"t")
      .select(PolyHash.polyHash($"t")).as[Long].collect().toSeq
    assert(sql == api)
  }

  test("minhash_sig from SQL equals the Column API and is 64 wide") {
    Seq("a b c d e f g h i j").toDF("t").createOrReplaceTempView("mh_in")
    spark.sql("CREATE OR REPLACE TEMP VIEW mh_sh AS " +
      "SELECT split(lower(trim(t)), '\\\\s+') AS toks FROM mh_in")
    val viaSql = spark.sql(
      "SELECT minhash_sig(toks, 64) AS sig FROM mh_sh")
      .as[Seq[Long]].head()
    val viaApi = Seq("a b c d e f g h i j").toDF("t")
      .select(TextFunctions.tokens($"t").as("toks"))
      .select(MinHashSig.minhashSig($"toks", 64)).as[Seq[Long]].head()
    assert(viaSql == viaApi)
    assert(viaSql.length == 64)
  }

  test("minhash signature agreement estimates jaccard") {
    // two docs sharing ~half their shingles should agree on roughly
    // half the signature positions; identical docs agree on all
    val docs = Seq(
      (1L, (1 to 40).map(i => s"tok$i").mkString(" ")),
      (2L, (1 to 40).map(i => s"tok$i").mkString(" ")),
      (3L, (21 to 60).map(i => s"tok$i").mkString(" "))).toDF("id", "text")
    val sigs = docs
      .select($"id", shingleSet($"text", 3).as("sh"))
      .select($"id", MinHashSig.minhashSig($"sh", 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val agree = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    // true shingle jaccard of the two ranges: |1..58 ∩ 21..38 grams|;
    // loose bounds — just assert it's between 5% and 60%
    assert(agree > 3 && agree < 40, s"agreement $agree/64")
  }

  test("empty shingle set yields MaxValue sentinels") {
    val sig = Seq("a b").toDF("t")
      .select(shingleSet($"t", 3).as("sh"))
      .select(MinHashSig.minhashSig($"sh", 8)).as[Seq[Long]].head()
    assert(sig.forall(_ == Long.MaxValue))
  }
}
