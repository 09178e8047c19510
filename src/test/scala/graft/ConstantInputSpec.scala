package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.{col, lit, transform}
import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must be total when numeric signal collapses to
  * a CONSTANT — every embedding the same vector, every price/value the
  * same number. Zero variance is the degenerate case of every
  * statistical kernel: z-scores (0/0), covariance/PCA (rank-0 matrix,
  * power iteration on a zero eigengap), k-means (all points in one
  * cell, ties everywhere), percentiles (all quantiles equal), ANN
  * (every distance identical — selection must still be deterministic
  * via id tie-breaks). Real corpora hit this locally (zero-padded
  * embedding tails, single-price catalogs), so the LOGIC must survive
  * it even though gate data never degenerates. A query may return
  * NULL/NaN statistic cells here; it must never throw.
  */
class ConstantInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val constDir: String = {
    val dir = Files.createTempDirectory("graft_const").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out = t match {
        case "embeddings" =>
          // same length/type per row, every component 0.5
          df.withColumn("embedding",
            transform(col("embedding"), _ => lit(0.5f)))
        case "lineitem" =>
          df.withColumn("l_extendedprice", lit(100.0))
            .withColumn("l_quantity", lit(5.0))
            .withColumn("l_discount", lit(0.05))
        case "events" =>
          df.withColumn("value", lit(1.0))
        case _ => df
      }
      out.coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total on constant numeric signal") {
      fn(spark, constDir).collect() // must not throw; NaN/NULL cells free
    }
}
