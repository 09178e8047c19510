package graft.operators

import graft.{Cols, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dataset splitting and stratified sampling for training pipelines.
  *
  * `byHash` is the scale-correct split: a hash of the stable row id, so
  * membership is a pure function of the row — independent of partition
  * layout, cluster size, or read order (unlike `df.sample`, whose seed
  * is only stable for a fixed partitioning). Adding data never moves an
  * existing row between splits.
  */
object DataSplit {
  import Cols._

  /** Split assignment from buckets of a row-id hash:
    * [0,train) → "train", [train,train+val) → "val", rest → "test",
    * out of 100 buckets.
    */
  def byHash(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = pmod(xxhash64(id), lit(100L))
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // q45: deterministic train/val/test split. The oracle-portable form
    // uses modulo buckets; the library's production form (byHash, same
    // dataflow) is covered by DataSplitSpec's stability properties.
    Q("q45_dataset_split",
      (s, dir) => {
        val split = when(col("doc_id") % 10 < 8, "train")
          .when(col("doc_id") % 10 === 8, "val")
          .otherwise("test")
        t(s, dir, "documents")
          .select(split.as("split"), col("n_chars"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy(col("split"))
      },
      Some("""SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
                     WHEN doc_id % 10 = 8 THEN 'val'
                     ELSE 'test' END AS split,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY split ORDER BY split""")),

    // ------------------------------------------------------------------
    // q46: stratified per-class sampling — k deterministic rows per
    // label via a keyed window (parallel per class, no global sort);
    // the class-balancing primitive for training-set construction.
    Q("q46_stratified_sample",
      (s, dir) => {
        // md5-hex of the id as the pseudo-random sort key: identical in
        // any engine, so the oracle picks the same rows
        val hashOrder = md5(col("vec_id").cast("string").cast("binary"))
        val w = Window.partitionBy(col("label"))
          .orderBy(col("h"), col("vec_id"))
        t(s, dir, "embeddings")
          .select(col("label"), col("vec_id"), hashOrder.as("h"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .drop("h")
          .orderBy(col("label"), col("rn"))
      },
      Some("""SELECT label, vec_id,
               CAST(row_number() OVER (PARTITION BY label
                    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rn
        FROM embeddings
        QUALIFY rn <= 5 ORDER BY label, rn"""))
  )
}
