package graft.tools

import graft.Sessions
import graft.functions.TextFunctions._
import graft.functions.MinHashSig.minhashSig
import org.apache.spark.sql.functions._

/** Scratch profiler for operator-stage timings (dev tool, not part of
  * the driver contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("scan")(docs)
    time("tokens")(docs.select(col("doc_id"), tokens(col("text")).as("t")))
    time("shingles")(docs.select(col("doc_id"), shingles(col("text"), 3).as("s")))
    time("shingleSet")(docs.select(col("doc_id"), shingleSet(col("text"), 3).as("s")))
    time("shingleSet+sig")(docs
      .select(col("doc_id"), shingleSet(col("text"), 3).as("sh"))
      .select(col("doc_id"), minhashSig(col("sh"), 64).as("sig")))
    spark.stop()
  }
}
