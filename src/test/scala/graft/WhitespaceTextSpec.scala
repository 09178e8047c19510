package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.{col, concat_ws, lit, pmod}
import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must be total when document TEXT degenerates to
  * empty/whitespace-only strings — a different failure class from NULL
  * columns (NullableInputSpec) and empty tables (EmptyInputSpec):
  * `split` on "" yields [""], shingle windows vanish, punct/stopword
  * ratios hit 0/0 (NaN) and length 0, byte entropy sees an empty or
  * all-0x20 histogram. Real scrapes contain such rows (decode
  * failures, whitespace-stripped boilerplate), and a filter pipeline
  * must CLASSIFY them, not crash on them. Every fourth doc keeps one
  * word so corpus-level models (vocab, LM, TF-IDF) have a nonempty
  * support. A query may return NaN/NULL signal values here; it must
  * never throw.
  */
class WhitespaceTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val wsDir: String = {
    val dir = Files.createTempDirectory("graft_wstext").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out =
        if (t != "documents") df
        else df.withColumn("text",
          // rotate "", spaces, tabs-newline, one real word
          pmod(col("doc_id"), lit(4L)) match { case m =>
            org.apache.spark.sql.functions
              .when(m === 0, "")
              .when(m === 1, "   ")
              .when(m === 2, " \t \n ")
              .otherwise(concat_ws(" ", lit("word")))
          })
      out.coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total on whitespace/empty text") {
      fn(spark, wsDir).collect() // must not throw; NaN/NULL cells free
    }
}
