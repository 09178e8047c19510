package graft

import java.nio.file.Files
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, expr, lit, pmod, to_timestamp, when}
import org.scalatest.funsuite.AnyFunSuite

/** Fourteenth totality sweep: every registry query must be total when
  * `events.ts` leaves the well-behaved 2024-ish band every other sweep
  * keeps it in. Real event feeds carry all of these: pre-1970 rows
  * (negative epoch — device clocks reset to vendor defaults), far-future
  * rows (ms-vs-s unit confusion at the producer lands 1970-era seconds
  * as 50000-era "seconds"), and single-instant floods (a replayed batch
  * stamps thousands of rows with one ingest time). The failure classes
  * are specific to timestamps: epoch arithmetic that assumes
  * non-negative seconds (truncating `/` vs `floorDiv` differ on
  * negatives), ms→µs multiplications that overflow near the 294k-year
  * long-µs horizon, window/sessionization logic degenerate under
  * total ties, and date casts outside the four-digit-year range both
  * engines print. The mapping is a pure function of `event_id` with
  * every fourth row kept ORIGINAL, so ordering fixtures (as-of joins,
  * funnels) still see realistic data interleaved with the hostile rows.
  */
class AdversarialTsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Year stays within [1, 9999] (the printable range of BOTH engines'
    * date formatters — beyond it this sweep would test formatter quirks,
    * not our operators): −100 years ⇒ ~1924/25 pre-epoch negatives once
    * shifted below 1970 (see below), +7000 years ⇒ ~9024 far future.
    */
  private def remap(ts: Column, id: Column): Column = {
    val m = pmod(id, lit(4L))
    when(m === 0, ts)                                        // original
      // pre-1970: negative epoch micros (gate events are 2024-ish, so
      // −100 years lands ~1924/25)
      .when(m === 1, ts - expr("INTERVAL 100 YEARS"))
      // far future, still formatter-printable
      .when(m === 2, ts + expr("INTERVAL 7000 YEARS"))
      // single-instant flood: every 4th event at exactly epoch 0 —
      // maximal ties for sort/sessionize/as-of tie-break paths AND the
      // zero boundary where truncating division differs from floorDiv
      .otherwise(to_timestamp(lit("1970-01-01 00:00:00")))
  }

  private lazy val advDir: String = {
    val dir = Files.createTempDirectory("graft_advts").toString
    Tables.names.foreach { t =>
      if (t == "events") {
        // Tables.load normalizes either shipped ts encoding to
        // TimestampType; the rewrite lands plain µs timestamps, which
        // load() passes through for the queries under test
        Tables.load(spark, "/root/testdata/sf0.001", t)
          .withColumn("ts", remap(col("ts"), col("event_id")))
          .coalesce(1).write.parquet(s"$dir/$t.parquet")
      } else {
        spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
          .coalesce(1).write.parquet(s"$dir/$t.parquet")
      }
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total on adversarial event timestamps") {
      fn(spark, advDir).collect() // must not throw
    }
}
