package graft

import org.apache.spark.sql.SparkSession

/** Single place to build a correctly-configured local session. The same
  * confs are what a cluster submit would set: AQE on (runtime skew-join +
  * partition coalescing), shuffle partitions sized to the parallelism at
  * hand (32 threads locally, not the 200 default), UTC session time zone
  * for date/timestamp determinism, and the legacy nanos conf so the
  * TIMESTAMP(NANOS) events parquet is readable (converted to µs in
  * [[Tables.load]]).
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: benign planner warnings (e.g. WindowExec's
    // single-partition notice on deliberately-global post-aggregation
    // windows) otherwise flood stderr around the one-line JSON contract
    // output of Bench/Verify.
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }
}
