package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-coverage query: a Spark-first implementation plus a DuckDB
  * oracle equivalent run by the driver on the same parquet tables.
  *
  * Column names are aligned between `run` and `oracle` (the driver's compare
  * sorts columns by name before hashing).
  *
  * `verificationOnly = true` marks a query whose IMPLEMENTATION SHAPE is
  * deliberately not the production one — an O(n²) all-pairs exact form
  * (q35/q40) or an interpreted-HOF/md5 portability twin (q48/q55/q66) kept
  * as an independent second fixture for a scale-path query. These stay in
  * the registry (they are correctness anchors, and the all-pairs kernels ARE
  * the within-bucket verification step at scale) but are excluded from Bench
  * and must not be mistaken for the library's production entry points — the
  * scale path is named in each one's `doc`.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    verificationOnly: Boolean = false)

object Q {
  /** Registry helper: fold a list of Q into the SparkEntry maps. */
  def queryMap(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap

  def oracleMap(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
