package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located fact⋈fact joins — the physical
  * design that removes the per-query shuffle at 100 TB.
  *
  * The reference's Postgres schema leans on monthly RANGE partitions +
  * b-tree indexes (`database/init.sql:223-275`); the Spark analogue for
  * JOIN locality is bucketing: both fact tables hash-clustered into the
  * same number of buckets on the join key at WRITE time, so every
  * subsequent join on that key is exchange-free (each task reads bucket
  * i of both sides). One shuffle paid once at load, zero shuffles on
  * every downstream join — the right trade for fact tables joined
  * constantly (orders⋈lineitem here; BucketedSpec proves the plan has
  * no Exchange).
  *
  * Bucket metadata lives in the session catalog (`saveAsTable`), which
  * is why this writes managed tables rather than bare parquet paths.
  */
object Bucketed {

  /** Write `df` hash-bucketed (and per-bucket sorted) on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys. With matching
    * bucket counts Spark plans a SortMergeJoin whose children are bare
    * scans — no ShuffleExchange, no Sort (buckets are pre-sorted).
    */
  def cooperativeJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
