package graft

import java.nio.file.Files
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, expr, lit, pmod, to_timestamp, when}
import org.scalatest.funsuite.AnyFunSuite

/** NINETEENTH totality sweep: adversarial ORDER/SHIP dates. The
  * fourteenth sweep covered `events.ts`; this one covers the two
  * relational date columns (`o_orderdate`, `l_shipdate`) that drive a
  * different operator surface — year() extraction and year-keyed set
  * ops (q63), date BETWEEN filters, the l_shipdate range join (q08),
  * month/quarter rollups, and the SCD/date-dimension machinery. A real
  * warehouse backfill carries all of these: vendor-default clock
  * resets (1899/1904/1970 epochs), the 9999-12-31 open-row sentinel
  * LEAKING from an upstream SCD extract into a transaction date — the
  * classic collision with our own SCD convention (it must flow through
  * as a weird-but-valid date, never be mistaken for "open"), the
  * proleptic year-1 floor, and the 1582 Julian→Gregorian gap where
  * hybrid-calendar readers historically shifted values.
  *
  * The remap is a pure function of the row's own primary key with
  * every fourth row kept ORIGINAL, each column phase-offset so one
  * order mixes classes (a year-1 orderdate against a 9999 shipdate —
  * negative date spans, which interval arithmetic must survive).
  */
class AdversarialDateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Slots: original / year-1 floor / 9999-12-31 sentinel leak /
    * 1582-10-04 (the day before the Gregorian cut in the historical
    * hybrid calendar — proleptic readers must pass it through
    * unshifted).
    */
  private def remap(d: Column, id: Column): Column = {
    val m = pmod(id, lit(4L))
    when(m === 0, d)
      .when(m === 1, to_timestamp(lit("0001-01-01 00:00:00")))
      .when(m === 2, to_timestamp(lit("9999-12-31 00:00:00")))
      .otherwise(to_timestamp(lit("1582-10-04 00:00:00")))
  }

  private lazy val advDir: String = {
    val dir = Files.createTempDirectory("graft_advdate").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out = t match {
        case "orders" =>
          df.withColumn("o_orderdate", remap(col("o_orderdate"), col("o_orderkey")))
        case "lineitem" =>
          // offset the phase so a row can mix classes across the two
          // columns (orderdate year 1 joined to shipdate year 9999)
          df.withColumn("l_shipdate",
            remap(col("l_shipdate"), col("l_orderkey") + lit(2L)))
        case _ => df
      }
      out.coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total on adversarial order/ship dates") {
      fn(spark, advDir).collect() // must not throw
    }
}
