package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Staging layer: CSV → validated, cleaned, typed parquet
  * (reference DAG 1, `staging_dag.py`). The reference's 1000-row pandas
  * chunking (S1) is Spark's native partitioned read; its per-table
  * cleaning (P1-P5) becomes column expressions; `to_sql replace/append`
  * (S5/S6) becomes a single atomic overwrite.
  */
object StagingJob {

  /** S3: header validation (staging_dag.py:35-45) — only presence of the
    * required subset is checked, extra columns are tolerated.
    */
  def validateHeader(df: DataFrame, table: String): Unit = {
    val missing = Schemas.requiredColumns(table).filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"staging table '$table' is missing required columns: ${missing.mkString(", ")}")
  }

  /** S1/S2: schema'd CSV read (never inferSchema in the production path). */
  def readCsv(spark: SparkSession, csvDir: String, table: String): DataFrame =
    spark.read
      .schema(Schemas.staging(table))
      .option("header", "true")
      .csv(s"$csvDir/$table.csv")

  /** Per-table cleaning, replicating staging_dag.py exactly. */
  def clean(table: String, df: DataFrame): DataFrame = table match {
    case "customers" =>
      // P1 lower+trim email (:59), P2 segment NULL→'Unknown' (:60)
      df.withColumn("email", lower(trim(col("email"))))
        .na.fill(Map("customer_segment" -> "Unknown"))
    case "products" =>
      // P3 lenient numeric cast (:102-103) is the schema'd read itself
      // (malformed → NULL, ANSI off); P4 drop null prices (:106)
      df.na.drop(Seq("cost_price", "selling_price"))
    case "orders" =>
      // P5 parse order_date (:141) via DateType schema; drop unparsable
      // (:145)
      df.na.drop(Seq("order_date"))
    case _ => df
  }

  def loadTable(spark: SparkSession, csvDir: String, outDir: String,
      table: String): DataFrame = {
    val raw = readCsv(spark, csvDir, table)
    validateHeader(raw, table)
    val cleaned = clean(table, raw)
    // S5: full-replace semantics, atomically.
    cleaned.write.mode("overwrite").parquet(s"$outDir/$table")
    spark.read.parquet(s"$outDir/$table")
  }

  def run(spark: SparkSession, csvDir: String, outDir: String): Map[String, DataFrame] =
    Schemas.staging.keys.map { t =>
      t -> loadTable(spark, csvDir, outDir, t)
    }.toMap
}
