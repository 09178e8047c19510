package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-coverage query: a Spark-first implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle equivalent run by the
  * driver on the same parquet tables.
  *
  * `oracle = None` → the driver records a weaker rows-only check; used only
  * for genuinely non-SQL operators (MinHash signatures, SimHash, rolling
  * fingerprints, ...), which get exact-expectation ScalaTest coverage
  * instead.
  *
  * Column names are aligned between `run` and `oracle` (the driver's compare
  * sorts columns by name before hashing).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  /** Registry helper: fold a list of Q into the SparkEntry maps. */
  def queryMap(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap

  def oracleMap(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
