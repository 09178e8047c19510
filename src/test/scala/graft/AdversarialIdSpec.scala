package graft

import java.nio.file.Files
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, pmod, when}
import org.scalatest.funsuite.AnyFunSuite

/** Thirteenth totality sweep: every registry query must be total when
  * the document/embedding JOIN KEY (`doc_id`) leaves the small-dense
  * range every other sweep keeps it in. Real ingest ids are snowflake
  * timestamps (2^62-adjacent), content hashes reinterpreted as signed
  * longs (negative), or near-overflow counters — and the failure class
  * is specific to ids: an ANSI `cast(... as int)`, an id+offset that
  * overflows, a mixer assuming inputs in [0, p), a partitioner fed a
  * negative modulus. The mapping is one injective pure function of
  * doc_id (branch ranges are disjoint for any realistic id), applied
  * IDENTICALLY to documents and embeddings so referential pairing —
  * and thus every join/ANN/dedup path — survives; every fourth id
  * stays original so seeded fixtures keep matching.
  */
class AdversarialIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def remap(id: Column): Column = {
    val m = pmod(id, lit(4L))
    when(m === 0, id)                             // original (id 0 stays:
                                                  //   seeded query vectors)
      .when(m === 1, -id - 1L)                    // strictly negative
      .when(m === 2, lit(Long.MaxValue) - id)     // overflow-adjacent
      .otherwise(id + (1L << 62))                 // snowflake-scale
  }

  private lazy val advDir: String = {
    val dir = Files.createTempDirectory("graft_advid").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      // embeddings pair with documents through vec_id == doc_id: remap
      // both through the same function so referential pairing survives
      val out =
        if (t == "documents") df.withColumn("doc_id", remap(col("doc_id")))
        else if (t == "embeddings")
          df.withColumn("vec_id", remap(col("vec_id")))
        else df
      out.coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total on adversarial doc_id keyspaces") {
      fn(spark, advDir).collect() // must not throw
    }
}
