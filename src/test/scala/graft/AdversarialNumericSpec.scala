package graft

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sixteenth registry-wide totality sweep: ADVERSARIAL NUMERIC columns.
  * The fifteenth sweep (NonFiniteEmbeddingSpec) poisoned embedding
  * VALUES; this one poisons every double-typed RELATIONAL column the
  * queries aggregate — prices, discounts, balances, event values — with
  * the IEEE garbage a real feed produces: NaN (a failed upstream
  * division), ±Infinity (an overflowed accumulator), a subnormal
  * (~4.9e-324, underflowed arithmetic), and negative zero. Parquet
  * carries all of them even though the generators never emit them.
  *
  * The known risk surface under Spark 4 ANSI mode: any cast of a
  * non-finite double to DECIMAL or an integral type THROWS — and the
  * decimal routing that makes money sums exact (Cols.dec, the q139/q141
  * cents quantization) is exactly such a cast, failing at executor
  * depth where the oracle gate can't see it. NaN is additionally
  * order-hostile: it compares false with everything, so filters pass it
  * through, while Spark SORTS it greater than +Inf.
  *
  * Round 13 added the FINITE-OVERFLOW class (±1e300): unlike NaN/Inf,
  * which ANSI maps to NULL on double→decimal, a finite value beyond the
  * target DECIMAL's range THROWS — so every decimal route needs either
  * a range guard or try_cast, not just a finiteness guard.
  *
  * Keys, dates, and category strings stay intact (the poison is keyed
  * on the row's own primary key mod 8, slot 7 keeping the original
  * value), so joins and group-bys still exercise their real paths. A
  * query may return fewer rows, NULLs, or NaN-valued outputs — it must
  * never throw.
  */
class AdversarialNumericSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Rotate `c` through the IEEE poison set keyed by `key` mod 8.
    * Slots 5/6 (±1e300) are the round-13 addition: a FINITE double far
    * outside every DECIMAL(p,s) range — it passes every isNotNull and
    * isnan/isinf guard, then ANSI double→decimal THROWS
    * (NUMERIC_VALUE_OUT_OF_RANGE) instead of the NULL that non-finites
    * map to. The stream-face bottom-k crash that motivated it was
    * exactly this class (fixed with try_cast; commit f30508d).
    */
  private def poison(c: Column, key: Column): Column =
    when(key % 8 === 0, lit(Double.NaN))
      .when(key % 8 === 1, lit(Double.PositiveInfinity))
      .when(key % 8 === 2, lit(Double.NegativeInfinity))
      .when(key % 8 === 3, lit(java.lang.Double.MIN_VALUE)) // subnormal
      .when(key % 8 === 4, lit(-0.0))
      .when(key % 8 === 5, lit(1e300))  // finite, overflows every DECIMAL
      .when(key % 8 === 6, lit(-1e300))
      .otherwise(c)

  private lazy val poisonDir: String = {
    val dir = Files.createTempDirectory("graft_advnum").toString
    val doubleCols: Map[String, (String, Seq[String])] = Map(
      "lineitem" -> ("l_orderkey",
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      "orders" -> ("o_orderkey", Seq("o_totalprice")),
      "part" -> ("p_partkey", Seq("p_retailprice")),
      "customer" -> ("c_custkey", Seq("c_acctbal")),
      "supplier" -> ("s_suppkey", Seq("s_acctbal")),
      "events" -> ("event_id", Seq("value")))
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out = doubleCols.get(t) match {
        case Some((key, cols)) =>
          // offset each column's poison phase so one row mixes classes
          // (a NaN price next to an Inf discount — the compound case)
          cols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
            acc.withColumn(c, poison(col(c), col(key) + lit(i)))
          }
        case None => df
      }
      out.write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total with NaN/Inf/subnormal/-0.0/finite-overflow numeric columns") {
      fn(spark, poisonDir).collect() // must not throw
    }
}
