package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator-coverage query registry into the single
  * `queries` / `oracleSql` maps the driver's Verify/Bench mains consume.
  */
object SparkEntry {

  /** All query registries, in SURVEY.md §2 inventory order. */
  def registry: Seq[Q] =
    operators.CoreQueries.all ++
      operators.AnalyticsQueries.all ++
      operators.TextQueries.all ++
      operators.DedupQueries.all ++
      operators.VectorQueries.all ++
      operators.DataSplit.all ++
      operators.TrainingQueries.all ++
      operators.RelationalExtras.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Q.queryMap(registry)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Q.oracleMap(registry)
}
