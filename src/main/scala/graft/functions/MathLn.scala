package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log via `java.lang.Math.log` — NOT Spark's built-in `log()`,
  * which routes through `StrictMath.log` (fdlibm) and disagrees with
  * platform libm by 1 ulp on a fraction of inputs (e.g. ln(3):
  * StrictMath …6681096 vs Math/libm …6681098). DuckDB uses libm, and
  * the correctness gate compares double cells by exact repr, so scoring
  * queries (q75 TF-IDF, q76 BM25) take their logs through this
  * expression: Math.log matched DuckDB bit-for-bit on a 2000-sample
  * probe over the tf/idf ratio domain, StrictMath did not.
  *
  * (Math.log compiles to the JIT's libm-equivalent intrinsic; it is the
  * same-or-faster choice, so this is parity with zero cost.)
  */
case class MathLn(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "math_ln"

  override protected def nullSafeEval(input: Any): Any =
    Math.log(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = java.lang.Math.log($c);")

  override protected def withNewChildInternal(newChild: Expression): MathLn =
    copy(child = newChild)
}

object MathLn {
  def ln(c: Column): Column =
    ColumnInterop.column(MathLn(ColumnInterop.expression(c)))
}
