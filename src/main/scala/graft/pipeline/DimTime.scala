package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dim_time build (warehouse_dag.py:160-180): DISTINCT dates from staged
  * orders, derived calendar attributes. §2.8 gotchas handled:
  *   1. day_of_week stored Postgres-style 0=Sun..6=Sat (dayofweek-1);
  *      is_weekend = IN (0,6).
  *   2. month/day names emitted trimmed (documented normalization of
  *      Postgres's 9-char blank padding).
  * The idempotent-insert (S9, ON CONFLICT DO NOTHING) becomes
  * dropDuplicates + anti-join against the existing dimension.
  */
object DimTime {

  def attributes(d: Column): DataFrame => DataFrame = { df =>
    val dowPg = dayofweek(d) - 1
    df.withColumn("time_key", date_format(d, "yyyyMMdd").cast("int"))
      .withColumn("full_date", d.cast("date"))
      .withColumn("year", year(d))
      .withColumn("quarter", quarter(d))
      .withColumn("month", month(d))
      .withColumn("month_name", date_format(d, "MMMM"))
      .withColumn("week", weekofyear(d))
      .withColumn("day_of_month", dayofmonth(d))
      .withColumn("day_of_year", dayofyear(d))
      .withColumn("day_of_week", dowPg)
      .withColumn("day_name", date_format(d, "EEEE"))
      .withColumn("is_weekend", dowPg.isin(0, 6))
  }

  /** Build new dim_time rows from order dates not already present. */
  def build(orders: DataFrame, existing: Option[DataFrame]): DataFrame = {
    val dates = orders
      .select(col("order_date").cast("date").as("d"))
      .filter(col("d").isNotNull)
      .distinct()
    val attrs = attributes(col("d"))(dates).drop("d")
    existing match {
      case Some(dim) => // S9/J5: only new time_keys survive
        dim.unionByName(attrs.join(dim.select("time_key"), Seq("time_key"), "left_anti"))
      case None => attrs
    }
  }
}
