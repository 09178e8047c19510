package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

/** The EIGHTEENTH totality sweep — NULL FLOOD. Sixteen/seventeen swept
  * single input classes (one poisoned column family at a time, keys
  * intact); this one is the all-at-once interaction class the others
  * deliberately avoided:
  *
  *   - phase 1 (all-NULL): EVERY column of EVERY table — join keys,
  *     agg keys, sketch inputs, ids included — is a typed NULL on every
  *     row, with row COUNTS preserved (distinct from EmptyInputSpec's
  *     zero-row tables: aggregation buffers, window frames, and UDAF
  *     tuple decoders all still RUN here, fed nothing but NULLs).
  *     A NULL join key matches nothing, a NULL group key forms the null
  *     group, a NULL sketch input must hit the skip-sentinel path — in
  *     the same row, simultaneously.
  *   - phase 2 (empty-string keys): every string column holds '' (NOT
  *     NULL) while non-string columns keep their values — the
  *     empty-string-vs-NULL semantics fork: '' joins and groups as a
  *     real value, tokenizes to zero tokens, hashes to the seed, and
  *     must never be conflated with NULL by an operator or coalesced
  *     into a sentinel scope.
  *
  * A query may return empty or all-NULL rows; it must never throw.
  */
class NullFloodSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val allNullDir: String = {
    val dir = Files.createTempDirectory("graft_nullflood").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out = df.columns.foldLeft(df) { (acc, c) =>
        acc.withColumn(c, lit(null).cast(df.schema(c).dataType))
      }
      out.write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val emptyStrDir: String = {
    val dir = Files.createTempDirectory("graft_emptystr").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out = df.schema.fields.foldLeft(df) { (acc, f) =>
        if (f.dataType == StringType) acc.withColumn(f.name, lit(""))
        else acc
      }
      out.write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name is total when every column is NULL in every row") {
      fn(spark, allNullDir).collect() // must not throw
    }
    test(s"$name is total when every string column is the empty string") {
      fn(spark, emptyStrDir).collect() // must not throw
    }
  }
}
