package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must be total when every FOREIGN KEY and
  * grouping attribute collapses to ONE hot value — the worst-case skew
  * input (one user produces every event, one domain produces every
  * document, every lineitem hits the same part/supplier). Primary keys
  * stay unique, so joins stay semantically valid; what degenerates is
  * the key DISTRIBUTION: single-group aggregations, windows with one
  * giant partition, joins where one build-side row matches everything.
  * A query may return fewer groups here; it must never throw (and at
  * scale this shape is what AQE skew handling + salting absorb — see
  * SCALING.md; this sweep pins that the LOGIC survives it).
  */
class HotKeyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (table, column -> hot value) — every non-key join/group column. */
  private val hot: Map[String, Map[String, Any]] = Map(
    "events" -> Map("user_id" -> 1L),
    "documents" -> Map("source" -> "src0", "lang" -> "en"),
    "customer" -> Map("c_nationkey" -> 0L, "c_mktsegment" -> "BUILDING"),
    "supplier" -> Map("s_nationkey" -> 0L),
    "orders" -> Map("o_custkey" -> 1L, "o_orderstatus" -> "F",
      "o_orderpriority" -> "1-URGENT"),
    "lineitem" -> Map("l_partkey" -> 1L, "l_suppkey" -> 1L,
      "l_returnflag" -> "N", "l_linestatus" -> "O"),
    "part" -> Map("p_brand" -> "Brand#11", "p_type" -> "hot", "p_size" -> 1L),
    "embeddings" -> Map("label" -> 0L))

  private lazy val hotDir: String = {
    val dir = Files.createTempDirectory("graft_hotkey").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val skewed = hot.getOrElse(t, Map.empty).foldLeft(df) {
        case (d, (c, v)) => d.withColumn(c, lit(v).cast(d.schema(c).dataType))
      }
      skewed.coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total under single-hot-key skew") {
      fn(spark, hotDir).collect() // must not throw; group count free
    }
}
