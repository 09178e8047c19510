package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Non-ASCII oracle gate fixture (r8, closing the r7 q90/q32 coupling).
  *
  * Rewrites the sf0.001 testdata into `target/nonascii/sf` with a
  * deterministic multilingual suffix appended to every third document —
  * 2-byte (é, ü, ж), 3-byte (東, 京, ελ) and 4-byte (😀) UTF-8
  * sequences — so char-count ≠ byte-count for those rows. Running
  * `Verify` restricted to the byte-sensitive registry entries over this
  * directory, then `tools/check.py`, proves the hash/entropy oracles
  * replay the SAME UTF-8 bytes the Scala expressions fold — the parity
  * that `ord()`-per-char oracles only faked on pure-ASCII testdata.
  * `tools/nonascii_gate.sh` wires the three steps.
  *
  * The suffix deliberately avoids Unicode whitespace and uppercase
  * non-ASCII letters: tokenization (`\s+` split) and `lower()` casing
  * are engine-shared preprocessing, not what this gate probes — byte
  * folds are.
  */
object NonAsciiFixture {

  /** Registry entries whose ORACLES fold raw UTF-8 bytes (PolyHash /
    * MinHash / SimHash / md5 / byte-entropy families) — the gate set.
    */
  val ByteSensitive: Seq[String] = Seq(
    "q32_fingerprints", "q33_exact_dedup", "q34_minhash_signatures",
    "q36_minhash_lsh_pairs", "q37_simhash", "q48_minhash_lsh_oracle",
    "q55_simhash_oracle", "q56_winnowing", "q67_corpus_overlap_fast",
    "q86_heavy_hitters", "q87_simhash_neardup", "q88_kmv_distinct",
    "q90_char_entropy")

  val Suffix = " café über naïve 東京 мир ελληνικά 😀δοκιμή"

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("target/nonascii/sf")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    val nonAscii = write(spark, srcDir, outDir)
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    println(s"[nonascii] wrote $outDir: ${docs.count()} documents, " +
      s"$nonAscii non-ASCII ( chars != bytes )")
    println(s"[nonascii] gate set: ${ByteSensitive.mkString(",")}")
    spark.stop()
  }

  /** Rewrite `srcDir` testdata into `outDir` (single-file-per-table
    * layout, the driver's), suffixing every third document with
    * [[Suffix]]. Returns the count of rewritten (non-ASCII) documents,
    * which must be positive.
    */
  def write(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      outDir: String): Long = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      val out =
        if (t != "documents") df
        else df.withColumn("text",
            when(col("doc_id") % 3 === 0, concat(col("text"), lit(Suffix)))
              .otherwise(col("text")))
          // n_chars is a stored attribute other queries read back; keep it
          // consistent with the rewritten text (q90 echoes it; q28-family
          // stats recompute from text on both sides anyway).
          .withColumn("n_chars", length(col("text")).cast("long"))
      // check.py reads each table as a single FILE (the driver's testdata
      // layout), so flatten Spark's one-part directory to a bare file.
      val tmp = s"$outDir/_tmp_$t"
      out.coalesce(1).write.mode("overwrite").parquet(tmp)
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      val part = Files.list(Paths.get(tmp)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      val dest = Paths.get(s"$outDir/$t.parquet")
      Files.deleteIfExists(dest)
      Files.move(part, dest)
      Files.list(Paths.get(tmp)).iterator().asScala.foreach(Files.delete)
      Files.delete(Paths.get(tmp))
    }
    val nonAscii = spark.read.parquet(s"$outDir/documents.parquet")
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    require(nonAscii > 0, "fixture produced no non-ASCII rows")
    nonAscii
  }
}
