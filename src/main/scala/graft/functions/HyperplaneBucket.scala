package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused signed-hyperplane LSH bucket id: all `nPlanes` projections of a
  * float-array embedding in one codegen'd array pass.
  *
  * Replaces the HOF formulation in [[VectorFunctions.hyperplaneBucket]]
  * (2·nPlanes interpreted array traversals per row — HOFs never join
  * whole-stage codegen). The plane weights are reproduced EXACTLY so
  * bucket assignments are identical to the declarative version (asserted
  * in FunctionsSpec): weight(plane p, dim i) =
  * `pmod(xxhash64(seed, p, i), 1e6)/1e6 - 0.5`, where xxhash64 is
  * Spark's expression — an XXH64 chain over int inputs starting from
  * seed 42, replicated here via `XXH64.hashInt` fold-in order. The
  * per-plane projection is the same sequential left-fold sum, and the
  * sign bits pack little-endian (`1L << p`).
  */
case class HyperplaneBucket(child: Expression, nPlanes: Int, seed: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  def compute(vec: ArrayData): Long = {
    val n = vec.numElements()
    // HOF parity: a NULL element nulls every plane's projection, and
    // when(NULL >= 0, ...).otherwise(0) lands every plane on 0 → bucket 0
    var i0 = 0
    while (i0 < n) {
      if (vec.isNullAt(i0)) return 0L
      i0 += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      // xxhash64(lit(seed), lit(p), i) prefix: constant per (seed, p)
      var hp = XXH64.hashInt(seed, 42L)
      hp = XXH64.hashInt(p, hp)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val h = XXH64.hashInt(i, hp)
        var r = h % 1000000L
        if (r < 0) r += 1000000L // Spark pmod
        val weight = r.toDouble / 1000000.0 - 0.5
        proj += vec.getFloat(i).toDouble * weight
        i += 1
      }
      if (proj >= 0) bucket += 1L << p
      p += 1
    }
    bucket
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("hpb", this,
        classOf[HyperplaneBucket].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBucket = copy(child = newChild)
}

object HyperplaneBucket {
  def hyperplaneBucketFused(vec: Column, nPlanes: Int, seed: Int): Column =
    ColumnInterop.column(
      HyperplaneBucket(ColumnInterop.expression(vec), nPlanes, seed))
}
