package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{DataType, LongType}

/** `(a·x + b) mod (2^61−1)` over a LONG column — the [[MulMod61]] affine
  * permutation as a standalone codegen expression. The scrambling
  * primitive for deterministic, engine-portable sampling on numeric row
  * ids: sequential ids become uniform in [0, p), and any threshold
  * `hash % M < k` selects a stable pseudo-random subset that is a pure
  * function of the id — independent of partitioning, cluster size, and
  * read order, and monotone in k (raising a sampling rate only ADDS
  * rows, it never swaps the kept set; xxhash64-based `df.sample` can't
  * promise either across engines).
  *
  * DuckDB replays it as `(a::HUGEINT * x + b) % p`, so sampling
  * decisions are oracle-checkable row-for-row (q73).
  *
  * Inputs must be in [0, 2^61−1) — row ids are; general longs should be
  * masked first.
  */
case class Affine61(child: Expression, a: Long, b: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "affine61"

  override protected def nullSafeEval(input: Any): Any =
    MulMod61.affine(a, b, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MulMod61.affine(${a}L, ${b}L, $c);")

  override protected def withNewChildInternal(newChild: Expression): Affine61 =
    copy(child = newChild)
}

object Affine61 {
  def affine61(c: Column, a: Long, b: Long): Column =
    ColumnInterop.column(Affine61(ColumnInterop.expression(c), a, b))

  /** Constants for corpus-mix sampling (independent of the MinHash and
    * SimHash families so sampling never correlates with dedup buckets).
    */
  val (mixA, mixB): (Long, Long) = {
    val rnd = new java.util.Random(20260814L)
    ((rnd.nextLong() & Long.MaxValue) % (MulMod61.P - 1) + 1,
      (rnd.nextLong() & Long.MaxValue) % MulMod61.P)
  }

  /** Constants for quality-weighted rejection sampling (q118) —
    * independent of the mix family so acceptance never correlates with
    * q73/q84's quota decisions on the same doc ids.
    */
  val (qualA, qualB): (Long, Long) = {
    val rnd = new java.util.Random(20260901L)
    ((rnd.nextLong() & Long.MaxValue) % (MulMod61.P - 1) + 1,
      (rnd.nextLong() & Long.MaxValue) % MulMod61.P)
  }

  /** Constants for weighted sampling WITHOUT replacement (q124) — its
    * exponential keys must be independent of both the mix quotas and
    * q118's acceptance draws, or "selected by q124" would correlate
    * with "kept by q118" on the same doc ids.
    */
  val (wsA, wsB): (Long, Long) = {
    val rnd = new java.util.Random(20261001L)
    ((rnd.nextLong() & Long.MaxValue) % (MulMod61.P - 1) + 1,
      (rnd.nextLong() & Long.MaxValue) % MulMod61.P)
  }

  /** Constants for the q136 classifier-Pareto acceptance draw — its own
    * family so "kept by the trained-quality sample" never correlates
    * with the q73/q118/q124 decisions on the same doc ids.
    */
  val (parA, parB): (Long, Long) = {
    val rnd = new java.util.Random(20261101L)
    ((rnd.nextLong() & Long.MaxValue) % (MulMod61.P - 1) + 1,
      (rnd.nextLong() & Long.MaxValue) % MulMod61.P)
  }
}
