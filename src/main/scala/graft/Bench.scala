package graft

/** Benchmark main (driver contract): times each headline query at the
  * given scale-factor dir and prints one JSON line.
  *
  * - Results are materialized through the noop sink: full computation,
  *   no collect, no pruning shortcut a `count()` would allow.
  * - One warmup query absorbs JVM/classloader/codegen startup so the
  *   numbers reflect steady-state execution.
  * - q35/q40 are excluded: they are the deliberately O(n²) exact-oracle
  *   twins of the LSH-based q36/q41 scale paths (which are timed).
  */
object Bench {
  /** Verification-oracle queries whose production twin is benchmarked. */
  private val oracleOnly =
    Set("q35_jaccard_topk", "q40_cosine_neardup", "q48_minhash_lsh_oracle",
      "q55_simhash_oracle", "q66_corpus_overlap")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)

    def runNoop(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.registry.map(_.name).filterNot(oracleOnly)
    // Warmup absorbs JVM/classloader/codegen startup. Three queries with
    // disjoint operator shapes (hash agg / filter+sort+string kernels /
    // multi-join) so the first timed occurrence of each codegen path
    // isn't paying first-compile cost; results discarded.
    Seq("q01_pricing_summary", "q02_project_filter", "q04_multi_join")
      .filter(SparkEntry.queries.contains).foreach(runNoop)

    val results = names.map(n => n -> runNoop(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
