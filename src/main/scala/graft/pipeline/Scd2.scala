package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic SCD Type 2 as a pure snapshot rewrite — no mutable store, no
  * UPDATE. The reference mutates in place (close changed rows, insert new
  * versions: `warehouse_dag.py:38-77` customers, `:100-141` products); at
  * scale the idiomatic Spark shape is compute-the-next-snapshot and
  * atomically overwrite:
  *
  *   next = closed(changed, expiry=asOf-1) ∪ unchanged ∪ stillCurrentRest
  *          ∪ newVersions(changed ∪ brandNew, effective=asOf)
  *
  * Change detection uses plain 3-valued `=!=` (NOT null-safe `<=>`): a
  * NULL on either side means "not changed", exactly the reference's
  * `s.city != w.city` semantics (SURVEY.md §2.8 gotcha 5).
  *
  * Surrogate keys: dense `row_number` over (businessKey, effective_date)
  * — deterministic given the snapshot, no SERIAL needed. The global
  * window is acceptable because dimensions are small by definition; fact
  * tables never get surrogate keys (they carry business keys + date
  * keys).
  */
object Scd2 {

  val MetaCols: Seq[String] = Seq("effective_date", "expiry_date", "is_current")

  /** Open-row expiry sentinel, matching the reference's
    * `'9999-12-31'::date` (warehouse_dag.py:69) — current rows carry a
    * far-future date, not NULL, so BETWEEN-style as-of lookups need no
    * null handling.
    */
  val OpenExpiry: Column = lit("9999-12-31").cast("date")

  /** First load: everything becomes current as of `asOf`. */
  def initial(staged: DataFrame, asOf: Column): DataFrame =
    staged
      .withColumn("effective_date", asOf.cast("date"))
      .withColumn("expiry_date", OpenExpiry)
      .withColumn("is_current", lit(true))

  /** One SCD2 merge step.
    *
    * @param dim      current dimension snapshot (with MetaCols)
    * @param staged   incoming staging batch (business columns only)
    * @param keyCol   business key column name
    * @param tracked  columns whose change opens a new version
    * @param asOf     load date (reference: CURRENT_DATE — parameterized
    *                 per §2.8 gotcha 11)
    */
  def merge(dim: DataFrame, staged: DataFrame, keyCol: String,
      tracked: Seq[String], asOf: Column): DataFrame = {
    require(tracked.nonEmpty,
      "Scd2.merge needs at least one tracked column (an empty list would " +
        "mean no change can ever open a version)")
    val businessCols = dim.columns.filterNot(MetaCols.contains).toSeq
    val current = dim.filter(col("is_current"))
    val history = dim.filter(!col("is_current"))

    // 3VL change predicate: any tracked column differs (NULLs compare
    // to "unknown" → not changed), replicating `s.x != w.x` (J3/J4).
    val stagedK = staged.select(businessCols.map(col): _*)
    val joined = stagedK.alias("s")
      .join(current.alias("w"), col(s"s.$keyCol") === col(s"w.$keyCol"), "left")
    val changedPred = tracked
      .map(c => col(s"s.$c") =!= col(s"w.$c"))
      .reduce(_ || _)

    val newKeys = joined.filter(col(s"w.$keyCol").isNull)
      .select(col(s"s.$keyCol").as(keyCol))
    val changedKeys = joined.filter(col(s"w.$keyCol").isNotNull && changedPred)
      .select(col(s"s.$keyCol").as(keyCol))

    // Close the changed current rows (expiry = asOf - 1 day,
    // warehouse_dag.py:40).
    val closed = current
      .join(changedKeys, Seq(keyCol), "left_semi")
      .withColumn("expiry_date", date_sub(asOf.cast("date"), 1))
      .withColumn("is_current", lit(false))
    val untouched = current.join(changedKeys, Seq(keyCol), "left_anti")

    // New versions: changed + brand-new keys take the staged values.
    val openKeys = changedKeys.unionByName(newKeys)
    val opened = stagedK
      .join(openKeys, Seq(keyCol), "left_semi")
      .withColumn("effective_date", asOf.cast("date"))
      .withColumn("expiry_date", OpenExpiry)
      .withColumn("is_current", lit(true))

    val metaSelect = (businessCols ++ MetaCols).map(col)
    history.select(metaSelect: _*)
      .unionByName(closed.select(metaSelect: _*))
      .unionByName(untouched.select(metaSelect: _*))
      .unionByName(opened.select(metaSelect: _*))
  }

  /** Deterministic dense surrogate keys for a dimension snapshot. */
  def withSurrogateKey(dim: DataFrame, keyName: String,
      businessKey: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(businessKey), col("effective_date"))
    dim.withColumn(keyName, row_number().over(w).cast("long"))
  }
}
