package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must be total on SINGLE-ROW tables — the
  * first-day corpus (one document, one event, one vector, one order).
  * Empty inputs are covered by [[EmptyInputSpec]]; one row is a
  * different failure class: degenerate windows, zero variance, 0/0 in
  * per-group rates, self-join shapes with no second row, k-selection
  * with k > n. A query may return 0..n rows here; it must never throw.
  */
class SingleRowInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val oneRowDir: String = {
    val dir = Files.createTempDirectory("graft_onerow").toString
    Tables.names.foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(1).coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total on single-row tables") {
      fn(spark, oneRowDir).collect() // must not throw; row count free
    }
}
