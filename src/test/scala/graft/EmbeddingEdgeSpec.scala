package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Eleventh registry-wide totality sweep: degenerate EMBEDDINGS. The
  * ten text/relational sweeps never perturb the vector column itself;
  * this one rotates it through the failure shapes an embedding feed
  * actually produces — an encoder that emitted nothing (empty array),
  * collapsed to the origin (all-zero vector: every norm is 0, cosine
  * becomes 0/0), or was truncated mid-write (half-dimension vector:
  * every fixed-dim kernel's index assumption breaks). Keys stay intact
  * (vec_id % 4 picks the shape deterministically); a query may return
  * fewer or null rows but must never throw — the risk surface is the
  * fused vector kernels (IntDot/CosineSim/HyperplaneBucket) and the
  * driver-side model math (covariance/PCA/PQ/IVF), which at 100 TB
  * fail at executor depth where the oracle gate can't see them.
  */
class EmbeddingEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val edgeDir: String = {
    val dir = Files.createTempDirectory("graft_embedge").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out =
        if (t != "embeddings") df
        else df.withColumn("embedding",
          when(col("vec_id") % 4 === 0,
            array().cast("array<float>"))                    // empty
            .when(col("vec_id") % 4 === 1,
              transform(col("embedding"), _ => lit(0.0f)))   // zero vector
            .when(col("vec_id") % 4 === 2,
              slice(col("embedding"), 1, 32))                // truncated dim
            .otherwise(col("embedding")))                    // intact
      out.write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name is total with empty/zero/truncated embeddings") {
      fn(spark, edgeDir).collect() // must not throw
    }
}
