package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins (SURVEY.md §4 scale note).
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit fallback when one key dominates so heavily that even split
  * partitions bottleneck (the classic hot-customer / null-key case), or
  * when AQE is unavailable (streaming joins).
  *
  * Shape: the skewed (large) side gets a random-but-deterministic salt
  * in [0, n); the dimension side is exploded n× with every salt value;
  * the join key becomes (key, salt) — fan-out n on the small side, even
  * spread on the large side. Result rows are identical to the unsalted
  * join (verified by SkewJoinSpec).
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `key`, salted `n` ways.
    *
    * The salt must vary per ROW of the large side (hashing only the key
    * would put the whole hot key in one bucket — no spread at all), yet
    * stay deterministic so retries and speculative tasks agree: it is a
    * hash of the full large-side row (or the caller-chosen `saltBy`
    * columns, e.g. a unique event id).
    */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
      n: Int, saltBy: Seq[String] = Nil): DataFrame = {
    require(n > 0)
    val saltCols =
      (if (saltBy.nonEmpty) saltBy else large.columns.toSeq).map(col)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(n.toLong)).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(exploded, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
