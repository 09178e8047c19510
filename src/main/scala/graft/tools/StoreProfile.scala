package graft.tools

import graft.Sessions
import graft.operators.SketchStore
import org.apache.spark.sql.functions._

/** Scratch profiler for the sketch-store absorb phases (dev tool, not
  * part of the driver contract) — times the staged one-pass projection
  * write, each batch absorb, the at-least-once replay, and a rollup
  * read, so an ingest regression is attributable to a phase. The
  * staged-parquet-vs-localCheckpoint decision in [[SketchStore
  * .storeFor]]'s scaladoc was measured with this.
  */
object StoreProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[storeprofile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // warm the session
    graft.Tables.load(spark, dir, "events").count()
    val store = java.nio.file.Files.createTempDirectory("graft_sp").toString + "/state"
    val stage = java.nio.file.Files.createTempDirectory("graft_sps").toString + "/hashed"
    t("stage write (hash once)") {
      SketchStore.hashedProjection(graft.Tables.load(spark, dir, "events"),
          pmod(coalesce(col("event_id"), lit(0L)), lit(3)).as("bkey"))
        .write.partitionBy("bkey").parquet(stage)
    }
    val staged = spark.read.parquet(stage)
    (0 to 2).foreach(i => t(s"absorb batch $i") {
      SketchStore.updateHashed(spark, store, staged.filter(col("bkey") === i))
    })
    t("replay batch 0") {
      SketchStore.updateHashed(spark, store, staged.filter(col("bkey") === 0))
    }
    t("rollup read") {
      SketchStore.rollup(SketchStore.read(spark, store), Seq("scope"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
