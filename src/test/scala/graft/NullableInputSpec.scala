package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must be total when NON-KEY columns are null —
  * the dirty-feed case (a scraper that lost text bodies, events with no
  * payload, vectors that failed to embed). Keys stay non-null (the
  * staging layer's drop-null-rows gate, P4, owns corrupt keys); every
  * other column is nulled on half the rows, keyed on the row's own id
  * so the choice is deterministic. A query may return fewer or null-
  * valued rows; it must never throw — fused expressions are the risk
  * surface here (a codegen kernel that trusts its input is non-null
  * NPEs at executor depth where the oracle gate can't see it).
  */
class NullableInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** id column per table; every OTHER column is nulled when id % 2 = 0. */
  private val keyOf = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  private lazy val nulledDir: String = {
    val dir = Files.createTempDirectory("graft_nulled").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val key = keyOf(t)
      val out = df.columns.foldLeft(df) { (acc, c) =>
        if (c == key) acc
        else acc.withColumn(c,
          when(col(key) % 2 === 0, lit(null)).otherwise(col(c)))
      }
      out.write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total with nulled non-key columns") {
      fn(spark, nulledDir).collect() // must not throw
    }
}
