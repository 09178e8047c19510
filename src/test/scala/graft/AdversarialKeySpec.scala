package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.{col, lit, pmod, when}
import org.scalatest.funsuite.AnyFunSuite

/** Twelfth totality sweep: every registry query must be total when the
  * documents GROUP-BY keys (`source`, `lang`) degenerate to adversarial
  * strings — the one input class no earlier sweep perturbs (they all
  * rotate `text`, embeddings, or numeric columns). Real crawl metadata
  * contains exactly these: empty strings from broken extractors,
  * 1-char language tags, kilobyte-long source URLs, non-ASCII/RTL/
  * combining-mark site names, and values embedding the very delimiters
  * (comma, pipe, tab) a naive key-concat would collide on. Quota maps,
  * IN-lists, and per-source caps must CLASSIFY unknown keys (empty
  * group, NULL share, zero quota), never throw. Text stays intact so
  * corpus-level models keep their support; every sixth doc keeps its
  * original keys so joins against seeded source lists stay nonempty.
  */
class AdversarialKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 4947 chars: a plausibly-pathological crawl URL, ASCII so length
  // perturbs only key width, not any charset assumption under test.
  private val longKey = "https://" + ("verylongsubdomain." * 260) + "example.com"

  private def rot(c: org.apache.spark.sql.Column, keep: org.apache.spark.sql.Column) = {
    val m = pmod(c, lit(6L))
    when(m === 0, "")
      .when(m === 1, "x")
      .when(m === 2, longKey)
      .when(m === 3, "日本-ソース مصدر é")
      .when(m === 4, "a,b|c d\te")
      .otherwise(keep)
  }

  private lazy val advDir: String = {
    val dir = Files.createTempDirectory("graft_advkey").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out =
        if (t != "documents") df
        else df
          .withColumn("source", rot(col("doc_id"), col("source")))
          // offset the lang rotation so (source, lang) pairs decorrelate
          .withColumn("lang", rot(col("doc_id") + 3L, col("lang")))
      out.coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total on adversarial source/lang keys") {
      fn(spark, advDir).collect() // must not throw; empty/NULL groups free
    }
}
