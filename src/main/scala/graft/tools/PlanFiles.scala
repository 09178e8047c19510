package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Sessions, SparkEntry}

/** Dump `explain(formatted)` for a named list of queries into per-query
  * files (dev tool; the r14 optimization round's before/after plan
  * artifacts under plans/r14/). Usage:
  *   SPARK_GRAFT_PLAN_QUERIES=q75_tfidf,q36_minhash_lsh_pairs \
  *   SPARK_GRAFT_PLAN_SUFFIX=before \
  *   sbt "runMain graft.tools.PlanFiles"
  * Writes plans/r14/<name>_<suffix>.txt with the same temp-path nonce
  * normalization as PlanDump so committed files diff only on real plan
  * changes.
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = sys.env.getOrElse("SPARK_GRAFT_PLAN_QUERIES", "")
      .split(',').map(_.trim).filter(_.nonEmpty)
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "plan")
    val outDir = Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r14"))
    Files.createDirectories(outDir)
    val spark = Sessions.local("4")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .replaceAll(java.util.regex.Pattern.quote(
          System.getProperty("java.io.tmpdir").stripSuffix("/")) +
          "/graft_[a-z_]*[0-9]+", "/tmp/graft_tmp<nonce>")
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
