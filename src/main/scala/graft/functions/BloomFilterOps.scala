package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftinterop.ColumnInterop

/** Column wrappers over Spark's internal bloom-filter expressions — the
  * same `BloomFilterAggregate` / `BloomFilterMightContain` pair Catalyst
  * injects for runtime join pruning (InjectRuntimeFilter), exposed here
  * for EXPLICIT semi-join prefilters where the planner cannot infer one
  * (e.g. decontamination: prune the 100 TB train side against a bloom of
  * the eval side's n-gram keys before the exact equi-join).
  *
  * These are not in the public FunctionRegistry (Spark keeps them
  * internal), so they are wrapped via ColumnInterop like the project's
  * own fused expressions. The aggregate's result is one binary value of
  * FIXED size (numBits), independent of input cardinality: broadcasting
  * it is O(bits), and the probe is a codegen'd bit test per row.
  */
object BloomFilterOps {

  /** Aggregate a LongType column (hash your key first — `xxhash64`) into
    * a bloom filter sized for `estItems` items in `numBits` bits.
    */
  def bloomAgg(hashed: Column, estItems: Long, numBits: Long): Column =
    ColumnInterop.column(
      new BloomFilterAggregate(ColumnInterop.expression(hashed),
        Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** True if `hashed` MIGHT be in the filter (no false negatives — a
    * bloom prefilter can only over-approximate, so exact-join semantics
    * downstream are preserved).
    */
  def mightContain(bloom: Column, hashed: Column): Column =
    ColumnInterop.column(BloomFilterMightContain(
      ColumnInterop.expression(bloom), ColumnInterop.expression(hashed)))
}
