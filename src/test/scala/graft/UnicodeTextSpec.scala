package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.{col, lit, pmod, when}
import org.scalatest.funsuite.AnyFunSuite

/** Ninth totality sweep: every registry query must be total when
  * document TEXT is astral/RTL/combining-mark Unicode — the class a
  * real web scrape is full of and ASCII-ish gate data never exercises.
  * Failure modes this hunts (distinct from whitespace/empty text):
  * UTF-16 surrogate pairs split mid-character by `substring`/char
  * loops (a kernel iterating Java chars instead of code points),
  * regex `.` vs astral code points, byte-vs-char length mismatches in
  * entropy/ratio divisors, and case-folding across scripts. Every
  * fourth doc keeps plain ASCII words so corpus-level models (vocab,
  * LM, merges) retain nonempty ASCII support. Signal values may be
  * odd here; queries must never throw.
  */
class UnicodeTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // astral emoji (surrogate pairs), RTL Arabic with marks, combining
  // stacks + Hangul + math alphanumerics (astral), mixed with ASCII
  private val Emoji =
    "😀 🚀🚀 data 🤖 pipeline 📚📚📚"
  private val Rtl =
    "مرحبا بالعالم data النص عربي"
  private val Marks =
    "été ậ stack 𝕊𝕊 한국어 ßİi"

  private lazy val uniDir: String = {
    val dir = Files.createTempDirectory("graft_unitext").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out =
        if (t != "documents") df
        else df.withColumn("text",
          pmod(col("doc_id"), lit(4L)) match { case m =>
            when(m === 0, Emoji)
              .when(m === 1, Rtl)
              .when(m === 2, Marks)
              .otherwise(col("text")) // keep real ASCII support
          })
      out.coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total on astral/RTL/combining-mark text") {
      fn(spark, uniDir).collect() // must not throw
    }
}
