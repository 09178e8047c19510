package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit StructTypes for the seven staging inputs (FIXTURES.md §A;
  * reference DDL `database/init.sql:24-145`). CSV is always read with
  * these schemas — never inferSchema — and money stays DecimalType
  * end-to-end (SURVEY.md §2.8 gotcha 12).
  */
object Schemas {

  private def s(n: String) = StructField(n, StringType)
  private def dt(n: String) = StructField(n, DateType)
  private def ts(n: String) = StructField(n, TimestampType)
  private def i(n: String) = StructField(n, IntegerType)
  private def b(n: String) = StructField(n, BooleanType)
  private def dec(n: String, p: Int, sc: Int) =
    StructField(n, DecimalType(p, sc))

  /** init.sql:24-43 */
  val customers: StructType = StructType(Seq(
    s("customer_id"), s("first_name"), s("last_name"), s("email"),
    s("phone"), dt("date_of_birth"), s("gender"), s("address"), s("city"),
    s("state"), s("country"), s("postal_code"), dt("registration_date"),
    s("customer_segment"), s("preferred_category"), b("marketing_consent"),
    ts("created_at"), ts("updated_at")))

  /** init.sql:45-64 */
  val products: StructType = StructType(Seq(
    s("product_id"), s("product_name"), s("category"), s("subcategory"),
    s("brand"), s("sku"), dec("cost_price", 10, 2),
    dec("selling_price", 10, 2), dec("weight_kg", 8, 2), s("dimensions"),
    s("color"), s("size"), dec("rating", 3, 1), dt("launch_date"),
    b("is_active"), s("description"), ts("created_at"), ts("updated_at")))

  /** init.sql:66-81 */
  val orders: StructType = StructType(Seq(
    s("order_id"), s("customer_id"), dt("order_date"), s("order_status"),
    s("payment_method"), dec("subtotal", 12, 2),
    dec("discount_amount", 12, 2), dec("shipping_cost", 8, 2),
    dec("tax_amount", 10, 2), dec("total_amount", 12, 2),
    s("shipping_address"), dt("delivery_date"), ts("created_at"),
    ts("updated_at")))

  /** init.sql:83-91 */
  val orderItems: StructType = StructType(Seq(
    s("order_item_id"), s("order_id"), s("product_id"), i("quantity"),
    dec("unit_price", 10, 2), dec("total_price", 12, 2), ts("created_at")))

  /** init.sql:93-110 (INET → String, SURVEY.md §1.3) */
  val clickstream: StructType = StructType(Seq(
    s("event_id"), s("session_id"), s("customer_id"), s("product_id"),
    s("event_type"), s("page_url"), s("referrer_url"), s("user_agent"),
    s("device_type"), s("browser"), s("ip_address"), s("country"),
    s("city"), ts("timestamp"), i("duration_seconds"), ts("created_at")))

  /** init.sql:112-130 */
  val marketingCampaigns: StructType = StructType(Seq(
    s("campaign_id"), s("campaign_name"), s("channel"), dt("start_date"),
    dt("end_date"), dec("budget", 12, 2), s("target_audience"),
    s("objective"), i("impressions"), i("clicks"), i("conversions"),
    dec("cost_per_click", 8, 2), dec("conversion_rate", 5, 2),
    dec("roi", 8, 2), b("is_active"), ts("created_at"), ts("updated_at")))

  /** init.sql:132-145 */
  val inventory: StructType = StructType(Seq(
    s("inventory_id"), s("product_id"), s("warehouse_location"),
    i("current_stock"), i("reserved_stock"), i("reorder_point"),
    i("max_stock"), dt("last_restocked"), s("supplier_id"),
    i("lead_time_days"), ts("created_at"), ts("updated_at")))

  val staging: Map[String, StructType] = Map(
    "customers" -> customers,
    "products" -> products,
    "orders" -> orders,
    "order_items" -> orderItems,
    "clickstream" -> clickstream,
    "marketing_campaigns" -> marketingCampaigns,
    "inventory" -> inventory)

  /** Required-column subsets for header validation
    * (staging_dag.py:35-45 keeps only a subset mandatory).
    */
  val requiredColumns: Map[String, Seq[String]] = Map(
    "customers" -> Seq("customer_id", "email", "customer_segment"),
    "products" -> Seq("product_id", "cost_price", "selling_price"),
    "orders" -> Seq("order_id", "customer_id", "order_date", "total_amount"),
    "order_items" -> Seq("order_item_id", "order_id", "product_id",
      "quantity"),
    "clickstream" -> Seq("event_id", "session_id", "event_type",
      "timestamp"),
    "marketing_campaigns" -> Seq("campaign_id", "start_date", "end_date",
      "budget"),
    "inventory" -> Seq("inventory_id", "product_id", "current_stock"))
}
