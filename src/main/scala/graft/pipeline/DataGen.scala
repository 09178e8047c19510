package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully distributed generator for reference-shaped CSV
  * fixtures (value distributions from `scripts/generate_data.py`,
  * seed-stable without any driver-side RNG: every pseudo-random draw is
  * `xxhash64(seed, id, tag)` mapped to the target range, so the same
  * (seed, size) always produces identical data on any cluster layout —
  * the scalable replacement for the reference's single-process Faker
  * loop).
  */
object DataGen {

  val Seed = 42

  /** u(id, tag) ∈ [0, 1): deterministic per-row uniform. */
  private def u(id: Column, tag: String): Column =
    (pmod(xxhash64(lit(Seed), id, lit(tag)), lit(1000000L)).cast("double")
      / 1000000.0)

  private def pick(id: Column, tag: String, opts: Seq[String]): Column = {
    val idx = pmod(xxhash64(lit(Seed), id, lit(tag)), lit(opts.size.toLong))
    opts.zipWithIndex.foldLeft(lit(opts.head): Column) {
      case (acc, (o, i)) => when(idx === i, o).otherwise(acc)
    }
  }

  /** Weighted choice via CDF over u. */
  private def weighted(id: Column, tag: String,
      opts: Seq[(String, Double)]): Column = {
    val r = u(id, tag)
    val cdf = opts.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    opts.map(_._1).zip(cdf).reverse
      .foldLeft(lit(opts.last._1): Column) {
        case (acc, (o, c)) => when(r < c, o).otherwise(acc)
      }
  }

  private def money(c: Column): Column = round(c, 2).cast("decimal(12,2)")

  val Categories = Seq("Electronics", "Fashion", "Home", "Beauty",
    "Sports", "Books")
  val Segments = Seq("Premium" -> 0.2, "Regular" -> 0.6, "Budget" -> 0.2)
  val Cities = Seq("Dhaka", "Chittagong", "Sylhet", "Khulna", "Rajshahi")

  def customers(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    spark.range(n).select(
      format_string("CUST_%06d", id).as("customer_id"),
      concat(lit("First"), id).as("first_name"),
      concat(lit("Last"), id).as("last_name"),
      // ~2% NULL emails for the DQ check to find
      when(u(id, "email_null") < 0.02, lit(null))
        .otherwise(format_string("user%d@example.com", id)).as("email"),
      format_string("+8801%09d", id).as("phone"),
      date_add(lit("1955-01-01").cast("date"),
        (u(id, "dob") * 20000).cast("int")).as("date_of_birth"),
      pick(id, "gender", Seq("M", "F")).as("gender"),
      concat(lit("House "), id).as("address"),
      pick(id, "city", Cities).as("city"),
      lit("Dhaka Division").as("state"),
      lit("Bangladesh").as("country"),
      (lit(1000) + (u(id, "postal") * 9000).cast("int")).cast("string")
        .as("postal_code"),
      date_add(lit("2023-07-01").cast("date"),
        (u(id, "reg") * 730).cast("int")).as("registration_date"),
      // a few NULL segments → cleaned to 'Unknown' at staging
      when(u(id, "seg_null") < 0.03, lit(null))
        .otherwise(weighted(id, "segment", Segments)).as("customer_segment"),
      pick(id, "prefcat", Categories).as("preferred_category"),
      (u(id, "consent") < 0.7).as("marketing_consent"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("created_at"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("updated_at"))
  }

  def products(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    val selling = money(lit(20.0) + u(id, "price") * 980.0)
    spark.range(n).select(
      format_string("PROD_%06d", id).as("product_id"),
      concat(lit("Product "), id).as("product_name"),
      pick(id, "cat", Categories).as("category"),
      concat(pick(id, "cat", Categories), lit(" Sub")).as("subcategory"),
      pick(id, "brand", Seq("Sony", "Samsung", "Apex", "Nova", "Zen"))
        .as("brand"),
      format_string("SKU%06d", id).as("sku"),
      // cost = 40-70% of selling (generate_data.py:119)
      money(selling * (lit(0.4) + u(id, "costr") * 0.3)).as("cost_price"),
      selling.as("selling_price"),
      money(lit(0.1) + u(id, "wt") * 9.9).cast("decimal(8,2)").as("weight_kg"),
      lit("10x10x10").as("dimensions"),
      pick(id, "color", Seq("Red", "Blue", "Black", "White")).as("color"),
      pick(id, "size", Seq("XS", "S", "M", "L", "XL", "One Size")).as("size"),
      round(lit(2.5) + u(id, "rating") * 2.5, 1).cast("decimal(3,1)")
        .as("rating"),
      date_add(lit("2024-07-01").cast("date"),
        (u(id, "launch") * 365).cast("int")).as("launch_date"),
      (u(id, "active") < 0.75).as("is_active"),
      concat(lit("Description "), id).as("description"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("created_at"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("updated_at"))
  }

  /** Orders reference existing customers (FK guaranteed by modulo). */
  def orders(spark: SparkSession, n: Long, nCustomers: Long): DataFrame = {
    val id = col("id")
    val subtotal = money(lit(30.0) + u(id, "sub") * 1470.0)
    val discount = money(
      when(u(id, "hasdisc") < 0.5, subtotal * (lit(0.05) + u(id, "disc") * 0.15))
        .otherwise(lit(0.0)))
    val shipping = money(
      when(subtotal > 500, lit(0.0))
        .otherwise(lit(10.0) + u(id, "ship") * 40.0)).cast("decimal(8,2)")
    val tax = money((subtotal - discount) * 0.15).cast("decimal(10,2)")
    spark.range(n).select(
      format_string("ORD_%08d", id).as("order_id"),
      format_string("CUST_%06d", pmod(xxhash64(lit(Seed), id, lit("cust")),
        lit(nCustomers))).as("customer_id"),
      date_add(lit("2024-07-01").cast("date"),
        (u(id, "odate") * 365).cast("int")).as("order_date"),
      weighted(id, "status", Seq("Completed" -> 0.6, "Shipped" -> 0.2,
        "Processing" -> 0.15, "Cancelled" -> 0.05)).as("order_status"),
      pick(id, "pay", Seq("Credit Card", "bKash", "Nagad", "Bank Transfer"))
        .as("payment_method"),
      subtotal.as("subtotal"),
      discount.as("discount_amount"),
      shipping.as("shipping_cost"),
      tax.as("tax_amount"),
      money(subtotal - discount + shipping + tax).as("total_amount"),
      concat(lit("Ship to house "), id).as("shipping_address"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("created_at"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("updated_at"))
      .withColumn("delivery_date", // order_date + 1..7d (generate_data.py:225)
        date_add(col("order_date"),
          (u(col("order_id"), "deliv") * 6).cast("int") + 1))
  }

  def orderItems(spark: SparkSession, n: Long, nOrders: Long,
      nProducts: Long): DataFrame = {
    val id = col("id")
    val unit = money(lit(20.0) + u(id, "uprice") * 980.0)
    val qty = (u(id, "qty") * 3).cast("int") + 1
    spark.range(n).select(
      format_string("OI_%08d", id).as("order_item_id"),
      format_string("ORD_%08d", pmod(xxhash64(lit(Seed), id, lit("oi_ord")),
        lit(nOrders))).as("order_id"),
      format_string("PROD_%06d", pmod(xxhash64(lit(Seed), id, lit("oi_prod")),
        lit(nProducts))).as("product_id"),
      qty.as("quantity"),
      unit.cast("decimal(10,2)").as("unit_price"),
      money(unit * qty).as("total_price"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("created_at"))
  }

  def clickstream(spark: SparkSession, n: Long, nCustomers: Long,
      nProducts: Long): DataFrame = {
    val id = col("id")
    spark.range(n).select(
      format_string("EVT_%08d", id).as("event_id"),
      format_string("SESS_%08d", (id / 5).cast("long")).as("session_id"),
      // 30% anonymous (generate_data.py:251)
      when(u(id, "anon") < 0.3, lit(null))
        .otherwise(format_string("CUST_%06d",
          pmod(xxhash64(lit(Seed), id, lit("cs_cust")), lit(nCustomers))))
        .as("customer_id"),
      when(u(id, "noprod") < 0.5, lit(null))
        .otherwise(format_string("PROD_%06d",
          pmod(xxhash64(lit(Seed), id, lit("cs_prod")), lit(nProducts))))
        .as("product_id"),
      pick(id, "etype", Seq("page_view", "product_view", "add_to_cart",
        "remove_from_cart", "checkout", "purchase", "search"))
        .as("event_type"),
      concat(lit("/page/"), id % 100).as("page_url"),
      when(u(id, "ref") < 0.7, lit(null))
        .otherwise(lit("https://google.com")).as("referrer_url"),
      lit("Mozilla/5.0").as("user_agent"),
      pick(id, "device", Seq("desktop", "mobile", "tablet")).as("device_type"),
      pick(id, "browser", Seq("Chrome", "Firefox", "Safari", "Edge"))
        .as("browser"),
      format_string("10.0.%d.%d", id % 256, (id / 256).cast("long") % 256).as("ip_address"),
      lit("Bangladesh").as("country"),
      pick(id, "ccity", Cities).as("city"),
      timestamp_seconds(
        unix_timestamp(lit("2024-07-01 00:00:00").cast("timestamp")) +
          (u(id, "ts") * 31536000).cast("long")).as("timestamp"),
      (lit(5) + (u(id, "dur") * 295).cast("int")).as("duration_seconds"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("created_at"))
  }

  def marketingCampaigns(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    val budget = money(lit(5000.0) + u(id, "budget") * 95000.0)
    val impressions = (lit(10000) + (u(id, "imp") * 990000).cast("int"))
    val clicks = (impressions.cast("double") *
      (lit(0.01) + u(id, "ctr") * 0.07)).cast("int")
    val conversions = (clicks.cast("double") *
      (lit(0.02) + u(id, "conv") * 0.13)).cast("int")
    val start = date_add(lit("2024-07-01").cast("date"),
      (u(id, "cstart") * 330).cast("int"))
    spark.range(n).select(
      format_string("CAMP_%06d", id).as("campaign_id"),
      concat(lit("Campaign "), id).as("campaign_name"),
      pick(id, "channel", Seq("Email", "Facebook Ads", "Google Ads", "SMS",
        "Instagram")).as("channel"),
      start.as("start_date"),
      date_add(start, (u(id, "clen") * 53).cast("int") + 7).as("end_date"),
      budget.as("budget"),
      pick(id, "aud", Seq("All", "Premium", "Regular", "Budget"))
        .as("target_audience"),
      pick(id, "obj", Seq("Awareness", "Conversion", "Retention"))
        .as("objective"),
      impressions.as("impressions"),
      clicks.as("clicks"),
      conversions.as("conversions"),
      money(when(clicks > 0, budget / clicks).otherwise(lit(0)))
        .cast("decimal(8,2)").as("cost_per_click"),
      round(when(clicks > 0, conversions.cast("double") / clicks * 100)
        .otherwise(lit(0.0)), 2).cast("decimal(5,2)").as("conversion_rate"),
      round((conversions.cast("double") * 75 - budget) / budget * 100, 2)
        .cast("decimal(8,2)").as("roi"),
      (u(id, "cactive") < 0.5).as("is_active"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("created_at"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("updated_at"))
  }

  /** Every product × 3 warehouses (generate_data.py:323-333). */
  def inventory(spark: SparkSession, nProducts: Long): DataFrame = {
    val id = col("id")
    val stock = (u(id, "stock") * 1000).cast("int")
    spark.range(nProducts * 3).select(
      format_string("INV_%06d", id).as("inventory_id"),
      format_string("PROD_%06d", (id / 3).cast("long")).as("product_id"),
      // direct index map so each product gets all three distinct sites
      element_at(array(lit("Dhaka_Main"), lit("Chittagong_Hub"),
        lit("Sylhet_Center")), (id % 3).cast("int") + 1)
        .as("warehouse_location"),
      stock.as("current_stock"),
      least(stock / 4, lit(50)).as("reserved_stock"),
      (lit(10) + (u(id, "reorder") * 90).cast("int")).as("reorder_point"),
      (lit(500) + (u(id, "maxstock") * 1500).cast("int")).as("max_stock"),
      date_add(lit("2025-04-01").cast("date"),
        (u(id, "restock") * 90).cast("int")).as("last_restocked"),
      format_string("SUP_%03d", id % 20).as("supplier_id"),
      (lit(3) + (u(id, "lead") * 27).cast("int")).as("lead_time_days"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("created_at"),
      lit("2025-07-01 00:00:00").cast("timestamp").as("updated_at"))
  }

  /** Write all seven CSVs (S11) for a fixture directory. */
  def writeAll(spark: SparkSession, dir: String, nCustomers: Long = 50,
      nProducts: Long = 20, nOrders: Long = 200): Unit = {
    def w(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(s"$dir/$name.csv")
    w(customers(spark, nCustomers), "customers")
    w(products(spark, nProducts), "products")
    w(orders(spark, nOrders, nCustomers), "orders")
    w(orderItems(spark, nOrders * 2, nOrders, nProducts), "order_items")
    w(clickstream(spark, nOrders * 5, nCustomers, nProducts), "clickstream")
    w(marketingCampaigns(spark, 10), "marketing_campaigns")
    w(inventory(spark, nProducts), "inventory")
  }
}
