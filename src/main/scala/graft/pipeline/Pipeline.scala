package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end driver: CSV → staging → warehouse (SCD2 dims + facts) →
  * analytics (KPI tables + views), mirroring the reference's three DAGs
  * (`staging_dag.py`, `warehouse_dag.py`, `analytics_dag.py`) with the
  * same intra-stage dependency order. `asOf` replaces every
  * CURRENT_DATE so runs are reproducible (§2.8 gotcha 11). Each stage
  * persists parquet, so stages are independently re-runnable — and fact
  * tables are written partitioned by order month (the Spark analogue of
  * the reference's monthly RANGE partitioning) so date-filtered reads
  * prune at the source.
  */
final case class PipelineResult(
    staging: Map[String, DataFrame],
    dimCustomers: DataFrame,
    dimProducts: DataFrame,
    dimTime: DataFrame,
    dimCampaigns: DataFrame,
    factOrders: DataFrame,
    factOrderItems: DataFrame,
    factClickstream: DataFrame,
    factInventory: DataFrame,
    customerMetrics: DataFrame,
    productMetrics: DataFrame,
    dailySales: DataFrame,
    monthlyTrends: DataFrame,
    customerAcquisition: DataFrame,
    campaignAttribution: DataFrame,
    checks: Seq[DataQuality.CheckResult]) {

  /** Serving layer: register every analytics table and view as temp
    * views with the reference's `public.*` mirror names
    * (analytics_dag.py:423-440) — the engine's equivalent of the
    * Postgres passthrough views Looker reads (a long-lived session or
    * Spark Thrift Server would expose these over JDBC).
    */
  def registerViews(spark: org.apache.spark.sql.SparkSession): Unit = {
    val tables = Map(
      "customer_metrics" -> customerMetrics,
      "product_metrics" -> productMetrics,
      "daily_sales" -> dailySales,
      "monthly_trends" -> monthlyTrends,
      "customer_acquisition" -> customerAcquisition,
      "campaign_attribution" -> campaignAttribution,
      "executive_summary" -> executiveSummary,
      "top_products" -> topProducts,
      "customer_segmentation" -> customerSegmentation,
      "seasonal_performance" -> seasonalPerformance,
      "acquisition_summary" -> acquisitionSummary)
    tables.foreach { case (name, df) =>
      df.createOrReplaceTempView(s"public_$name")
    }
  }

  def executiveSummary: DataFrame =
    AnalyticsJob.executiveSummary(customerMetrics, productMetrics, dailySales)
  def topProducts: DataFrame = AnalyticsJob.topProducts(productMetrics)
  def customerSegmentation: DataFrame =
    AnalyticsJob.customerSegmentation(customerMetrics)
  def seasonalPerformance: DataFrame =
    AnalyticsJob.seasonalPerformance(monthlyTrends)
  def acquisitionSummary: DataFrame =
    AnalyticsJob.acquisitionSummary(customerAcquisition)
}

object Pipeline {

  /** Derived dim columns the reference adds during SCD2 load:
    * full_name (P6, NULL-propagating concat) and profit_margin (P7).
    */
  private def customerDimColumns(df: DataFrame): DataFrame =
    df.withColumn("full_name", // `||` semantics: NULL propagates (g4)
      concat(col("first_name"), lit(" "), col("last_name")))

  private def productDimColumns(df: DataFrame): DataFrame =
    df.withColumn("profit_margin",
      round((col("selling_price") - col("cost_price"))
        / col("selling_price") * 100, 2))

  def run(spark: SparkSession, csvDir: String, outDir: String,
      asOfDate: LocalDate): PipelineResult = {
    val asOf = lit(java.sql.Date.valueOf(asOfDate))

    // ---- DAG 1: staging ------------------------------------------------
    val staging = StagingJob.run(spark, csvDir, s"$outDir/staging")

    // ---- DAG 2: warehouse ---------------------------------------------
    // dims first (parallel in the reference task graph), then facts.
    val dimTime = DimTime.build(staging("orders"), existing = None)

    val stagedCustomers = customerDimColumns(staging("customers"))
    val stagedProducts = productDimColumns(staging("products"))
    val dimCustomersNoKey = Scd2.initial(stagedCustomers, asOf)
    val dimProductsNoKey = Scd2.initial(stagedProducts, asOf)
    val dimCustomers =
      Scd2.withSurrogateKey(dimCustomersNoKey, "customer_key", "customer_id")
    val dimProducts =
      Scd2.withSurrogateKey(dimProductsNoKey, "product_key", "product_id")

    val factOrders = FactJobs.factOrders(staging("orders"), dimCustomers)
    val factOrderItems = FactJobs.factOrderItems(staging("order_items"),
      factOrders, dimProducts)
    val factClickstream = FactJobs.factClickstream(staging("clickstream"),
      dimCustomers, dimProducts, dimTime)
    val factInventory = FactJobs.factInventory(staging("inventory"),
      dimProducts)
    val dimCampaigns = FactJobs.dimCampaigns(staging("marketing_campaigns"),
      dimTime)

    // Persist warehouse, facts partitioned monthly (partition pruning).
    def persist(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$outDir/warehouse/$name")
      spark.read.parquet(s"$outDir/warehouse/$name")
    }
    def persistFact(df: DataFrame, name: String): DataFrame = {
      df.withColumn("order_month",
        (col("order_date_key") / 100).cast("int"))
        .write.mode("overwrite").partitionBy("order_month")
        .parquet(s"$outDir/warehouse/$name")
      spark.read.parquet(s"$outDir/warehouse/$name")
    }
    val wDimCustomers = persist(dimCustomers, "dim_customers")
    val wDimProducts = persist(dimProducts, "dim_products")
    val wDimTime = persist(dimTime, "dim_time")
    val wDimCampaigns = persist(dimCampaigns, "dim_marketing_campaigns")
    val wFactOrders = persistFact(factOrders, "fact_orders")
    val wFactOrderItems = persistFact(factOrderItems, "fact_order_items")
    val wFactClickstream = persist(factClickstream, "fact_clickstream")
    val wFactInventory = persist(factInventory, "fact_inventory")

    // ---- DAG 3: analytics ---------------------------------------------
    val customerMetrics = AnalyticsJob.customerMetrics(wDimCustomers,
      wFactOrders, wDimTime, asOf)
    val productMetrics = AnalyticsJob.productMetrics(wDimProducts,
      wFactOrderItems, wFactInventory)
    val dailySales = AnalyticsJob.dailySales(wFactOrders, wDimTime)
    val monthlyTrends = AnalyticsJob.monthlyTrends(wFactOrders, wDimTime)
    val customerAcquisition = AnalyticsJob.customerAcquisition(wDimCustomers,
      wFactOrders, wDimTime)
    val campaignAttribution = AnalyticsJob.campaignAttribution(wDimCampaigns,
      dailySales)

    def persistA(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$outDir/analytics/$name")
      spark.read.parquet(s"$outDir/analytics/$name")
    }
    val aCustomerMetrics = persistA(customerMetrics, "customer_metrics")
    val aProductMetrics = persistA(productMetrics, "product_metrics")
    val aDailySales = persistA(dailySales, "daily_sales")
    val aMonthlyTrends = persistA(monthlyTrends, "monthly_trends")
    val aAcquisition = persistA(customerAcquisition, "customer_acquisition")
    val aAttribution = persistA(campaignAttribution, "campaign_attribution")

    val checks = DataQuality.stagingChecks(staging) ++
      DataQuality.warehouseChecks(wDimCustomers, wDimProducts, wFactOrders) ++
      DataQuality.analyticsChecks(aCustomerMetrics, aDailySales)

    PipelineResult(staging, wDimCustomers, wDimProducts, wDimTime,
      wDimCampaigns, wFactOrders, wFactOrderItems, wFactClickstream,
      wFactInventory, aCustomerMetrics, aProductMetrics, aDailySales,
      aMonthlyTrends, aAcquisition, aAttribution, checks)
  }
}
