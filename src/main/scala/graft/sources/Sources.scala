package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Ingest/egress beyond the staging CSVs and testdata parquet: the
  * formats a large-scale training-data pipeline actually exchanges.
  *
  *   - JSONL — the lingua franca of LLM corpus tooling (one document
  *     per line). Read schema-ENFORCED (never inferred: inference is a
  *     full extra pass over 100 TB and yields run-dependent schemas)
  *     and corruption-TOLERANT: a malformed line must never kill a
  *     100 TB job, so PERMISSIVE mode captures it in a corrupt-record
  *     column for DQ accounting instead of throwing (FAILFAST) or
  *     silently dropping (DROPMALFORMED).
  *   - ORC — the second columnar format (predicate pushdown, column
  *     pruning, same scan APIs as parquet; Spark bundles the reader).
  *   - CSV — schema-enforced, same corruption capture.
  *
  * All readers return plain DataFrames that flow into the same
  * operators as the parquet tables ([[graft.Tables]]).
  */
object Sources {

  val CorruptCol = "_corrupt_record"

  /** `schema` + corrupt-record column, as the PERMISSIVE readers need
    * it declared up front.
    */
  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType))

  /** Schema-enforced, corruption-tolerant JSONL reader. Malformed lines
    * surface as rows with every data column NULL and the raw line in
    * [[CorruptCol]].
    *
    * Built as text-scan + `from_json` rather than `spark.read.json`:
    * the raw JSON datasource forbids any query whose pruned scan schema
    * is only the corrupt-record column (so `reader.count()` and
    * quarantine projections throw UNSUPPORTED_FEATURE), while a text
    * scan + parse expression has no such restriction and the same
    * per-line Jackson parse cost. Blank lines are skipped, matching the
    * JSON datasource.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), withCorrupt(schema), opts).as("j"))
      .select(col("j.*"))
  }

  /** Valid rows only (corrupt column dropped) — the common happy path. */
  def readJsonlClean(spark: SparkSession, path: String, schema: StructType): DataFrame =
    readJsonl(spark, path, schema)
      .filter(col(CorruptCol).isNull)
      .drop(CorruptCol)

  /** Streaming twin of [[readJsonl]]: watch `path` for new JSONL files
    * and parse them with the SAME text-scan + `from_json` transform, so
    * the batch and streaming ingest paths cannot diverge (one parse
    * definition, two scan modes). Malformed lines flow through as
    * quarantine rows here too — a corrupt file must never kill a
    * long-running ingest stream.
    */
  def readJsonlStream(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    spark.readStream.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), withCorrupt(schema), opts).as("j"))
      .select(col("j.*"))
  }

  /** DQ accounting for an ingest: (valid, corrupt) line counts — the
    * numbers every 100 TB ingest job should emit. One scan, one
    * map-side-combinable aggregate.
    */
  def jsonlStats(spark: SparkSession, path: String, schema: StructType): (Long, Long) = {
    val row = readJsonl(spark, path, schema)
      .agg(count(lit(1)).as("total"), count(col(CorruptCol)).as("corrupt"))
      .head()
    val (total, corrupt) = (row.getLong(0), row.getLong(1))
    (total - corrupt, corrupt)
  }

  /** Sharded JSONL writer (`shards` output files — the unit of
    * parallelism for whoever consumes the corpus next).
    */
  def writeJsonl(df: DataFrame, path: String, shards: Int): Unit =
    df.repartition(shards).write.mode("overwrite").json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Schema-enforced, corruption-tolerant CSV reader (header expected,
    * quoted multi-line fields supported — document text contains
    * newlines and commas).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)
}
