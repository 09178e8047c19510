package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Warehouse fact/dim builds (reference DAG 2, `warehouse_dag.py`),
  * re-expressed as declarative joins + atomic overwrites:
  *
  *   - keyed DELETE+INSERT refresh (S7/J11) → existing left_anti batch
  *     keys ∪ rebuilt batch rows;
  *   - TRUNCATE+INSERT (S8) → plain overwrite;
  *   - dims broadcast into fact joins (J1/J2/J6) — the 1000-executor
  *     plan shape; facts are written partitioned by month for partition
  *     pruning (the Spark analogue of the reference's monthly RANGE
  *     partitions, init.sql:223-242).
  */
object FactJobs {

  private def timeKey(d: Column): Column =
    date_format(d, "yyyyMMdd").cast("int")

  /** fact_orders (warehouse_dag.py:195-227): money columns COALESCEd to
    * 0 as-written (:218-220), `profit_amount = total - tax - shipping`
    * (the reference's "simple profit calculation", :223), and the
    * hardcoded `total_items = 1` — replicated, not fixed (§2.8 g9).
    */
  def factOrders(orders: DataFrame, dimCustomers: DataFrame): DataFrame = {
    val cur = dimCustomers.filter(col("is_current"))
      .select(col("customer_id"), col("customer_key"))
    val zero = lit(0).cast("decimal(12,2)")
    orders.join(broadcast(cur), Seq("customer_id"), "inner")
      .select(
        col("order_id"),
        col("customer_key"),
        timeKey(col("order_date")).as("order_date_key"),
        col("order_status"),
        col("payment_method"),
        col("subtotal"),
        coalesce(col("discount_amount"), zero).as("discount_amount"),
        coalesce(col("shipping_cost"), zero).as("shipping_cost"),
        coalesce(col("tax_amount"), zero).as("tax_amount"),
        col("total_amount"),
        (col("total_amount") - coalesce(col("tax_amount"), zero)
          - coalesce(col("shipping_cost"), zero)).as("profit_amount"),
        lit(1).as("total_items"),
        col("order_date"))
  }

  /** fact_order_items (warehouse_dag.py:247-273): J2 multi-way join. */
  def factOrderItems(orderItems: DataFrame, factOrders: DataFrame,
      dimProducts: DataFrame): DataFrame = {
    val curP = dimProducts.filter(col("is_current"))
      .select(col("product_id"), col("product_key"), col("cost_price"))
    orderItems
      .join(factOrders.select("order_id", "customer_key", "order_date_key",
        "order_date"), Seq("order_id"), "inner")
      .join(broadcast(curP), Seq("product_id"), "inner")
      .select(
        col("order_item_id"),
        col("order_id"),
        col("customer_key"),
        col("product_key"),
        col("order_date_key"),
        col("quantity"),
        col("unit_price"),
        col("total_price"),
        (col("total_price") - col("cost_price") * col("quantity"))
          .as("profit_amount"),
        col("order_date"))
  }

  /** S7/J11 keyed refresh: drop existing rows whose key appears in the
    * batch, then append the rebuilt batch (the engine's DELETE+INSERT).
    */
  def keyedRefresh(existing: Option[DataFrame], batch: DataFrame,
      key: String): DataFrame = existing match {
    case Some(e) =>
      e.join(batch.select(key).distinct(), Seq(key), "left_anti")
        .unionByName(batch)
    case None => batch
  }

  /** fact_clickstream (warehouse_dag.py:389-415): left joins keep
    * anonymous events with NULL dimension keys (J6); missing time_key
    * coalesced to the reference's constant default (P9).
    */
  def factClickstream(clickstream: DataFrame, dimCustomers: DataFrame,
      dimProducts: DataFrame, dimTime: DataFrame): DataFrame = {
    val curC = dimCustomers.filter(col("is_current"))
      .select(col("customer_id"), col("customer_key"))
    val curP = dimProducts.filter(col("is_current"))
      .select(col("product_id"), col("product_key"))
    clickstream
      .join(broadcast(curC), Seq("customer_id"), "left")
      .join(broadcast(curP), Seq("product_id"), "left")
      .join(broadcast(dimTime.select(col("time_key"), col("full_date"))),
        col("timestamp").cast("date") === col("full_date"), "left")
      .select(
        col("event_id"),
        col("session_id"),
        col("customer_key"),
        col("product_key"),
        coalesce(col("time_key"), lit(20240708)).as("time_key"),
        col("event_type"),
        col("device_type"),
        col("browser"),
        col("duration_seconds"),
        col("timestamp"))
  }

  /** fact_inventory (warehouse_dag.py:294-321): full refresh (S8). */
  def factInventory(inventory: DataFrame, dimProducts: DataFrame): DataFrame = {
    val curP = dimProducts.filter(col("is_current"))
      .select(col("product_id"), col("product_key"))
    inventory
      .join(broadcast(curP), Seq("product_id"), "left")
      .select(
        col("inventory_id"),
        col("product_key"),
        col("warehouse_location"),
        col("current_stock"),
        col("reserved_stock"),
        (col("current_stock") - col("reserved_stock")).as("available_stock"),
        col("reorder_point"),
        (col("current_stock") <= col("reorder_point")).as("needs_reorder"),
        col("last_restocked"),
        col("lead_time_days"))
  }

  /** dim_marketing_campaigns (warehouse_dag.py:339-369): full refresh
    * with start/end date keys resolved against dim_time (J6 ×2).
    */
  def dimCampaigns(campaigns: DataFrame, dimTime: DataFrame): DataFrame = {
    val tk = dimTime.select(col("time_key"), col("full_date"))
    campaigns
      .join(broadcast(tk.withColumnRenamed("time_key", "start_date_key")),
        col("start_date") === col("full_date"), "left")
      .drop("full_date")
      .join(broadcast(tk.withColumnRenamed("time_key", "end_date_key")),
        col("end_date") === col("full_date"), "left")
      .drop("full_date")
      .select(
        col("campaign_id"), col("campaign_name"), col("channel"),
        col("start_date"), col("end_date"), col("start_date_key"),
        col("end_date_key"), col("budget"), col("target_audience"),
        col("objective"), col("impressions"), col("clicks"),
        col("conversions"), col("cost_per_click"), col("conversion_rate"),
        col("roi"), col("is_active"))
  }
}
