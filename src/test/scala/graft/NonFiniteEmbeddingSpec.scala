package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fifteenth registry-wide totality sweep: NON-FINITE embeddings. The
  * eleventh sweep (EmbeddingEdgeSpec) rotates the vector column through
  * SHAPE failures (empty/zero/truncated); this one keeps the shape and
  * poisons the VALUES the way a broken encoder actually does — a NaN
  * from a 0/0 inside the model, an overflowed activation (±Inf), or a
  * whole-vector NaN fill from a failed batch. IEEE semantics make these
  * uniquely insidious: NaN compares false with everything (so it slips
  * through < and > gates), propagates through every sum, and under
  * ANSI mode CRASHES any cast to an integral type — the int8
  * quantization path and every micro-unit floor are the risk surface,
  * failing at executor depth where the oracle gate can't see them.
  * Keys stay intact (vec_id % 4 picks the poison deterministically); a
  * query may return fewer, null, or NaN-valued rows but must never
  * throw.
  */
class NonFiniteEmbeddingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val poisonDir: String = {
    val dir = Files.createTempDirectory("graft_nonfinite").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out =
        if (t != "embeddings") df
        else df.withColumn("embedding",
          when(col("vec_id") % 4 === 0,                      // one NaN component
            concat(slice(col("embedding"), 1, 3),
              array(lit(Float.NaN)),
              slice(col("embedding"), 5, 60)))
            .when(col("vec_id") % 4 === 1,                   // overflowed activations
              concat(array(lit(Float.PositiveInfinity), lit(Float.NegativeInfinity)),
                slice(col("embedding"), 3, 62)))
            .when(col("vec_id") % 4 === 2,                   // failed batch: all-NaN
              transform(col("embedding"), _ => lit(Float.NaN)))
            .otherwise(col("embedding")))                    // intact
      out.write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total with NaN/Inf embedding components") {
      fn(spark, poisonDir).collect() // must not throw
    }
}
