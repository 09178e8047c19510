package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused integer dot product of two `array<long>` columns — the scoring
  * kernel of the quantized k-means coarse quantizer (q43 IVF build +
  * probe). Exact 64-bit arithmetic: order-independent, so Spark's
  * shuffled aggregation and the single-threaded DuckDB oracle agree
  * bit-for-bit (the reason the quantizer works on `floor(x·1000 + 0.5)`
  * integers rather than floats). One codegen'd JVM loop per pair — the
  * `zip_with`+`aggregate` HOF form would pay two interpreted lambda
  * passes per row pair inside a k-way cross join.
  *
  * Inputs must be equal-length and products must stay within long range
  * (quantized embeddings: |v| ≤ ~10^3·dim·cluster-size — bounded by
  * construction, documented at the call site).
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("intDot", this, classOf[IntDot].getName)
      s"${ev.value} = $ref.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

object IntDot {
  def intDot(a: Column, b: Column): Column =
    ColumnInterop.column(IntDot(ColumnInterop.expression(a), ColumnInterop.expression(b)))
}
