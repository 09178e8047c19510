package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must be TOTAL on empty inputs: a first-day
  * corpus, an empty partition, or a filter that matches nothing must
  * produce an empty (or degenerate-but-defined) result, never throw.
  * Found by sweeping the registry over schema-preserving empty tables
  * (round 9): q78's funnel conversion divided 0/0 — an ANSI error in
  * Spark and NaN in DuckDB. This spec keeps the property for all
  * current and future queries.
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    Tables.names.foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total on empty tables") {
      fn(spark, emptyDir).collect() // must not throw; row count may be 0
    }
}
