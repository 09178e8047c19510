package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two float-array embeddings: dot product
  * and both L2 norms in ONE array pass, inside whole-stage codegen.
  *
  * Exists for the same reason as [[Shingles]]/[[MinHashSig]]: Spark's
  * higher-order functions are never codegen'd, so the declarative
  * `aggregate(zip_with(...))` formulation in [[VectorFunctions]] pays an
  * interpreted lambda + boxing per element — measured ~60µs per 64-dim
  * cosine, which made the IVF assignment stage (n·√n cosines) the
  * slowest query of the whole bench (q43 ≈ 6.8s at sf0.1).
  *
  * Bit-parity contract (the DuckDB-oracle hash compare depends on it):
  * the accumulation is the SAME sequential left fold over the same
  * double-widened terms as the HOF version —
  * `dot = ((0 + a0·b0) + a1·b1) + …`, `norm = sqrt((0 + a0²) + a1² …)`,
  * result `dot / (normA · normB)` — so results are bit-identical to
  * both the HOF formulation and DuckDB's `list_sum(list_transform(...))`
  * (verified in FunctionsSpec and by the q39/q40 oracle gate).
  *
  * Mismatched lengths and NULL elements return NULL (the HOF version's
  * zip_with would pad/propagate NULL and poison the fold the same way).
  * Inputs are strictly `array<float>` (ExpectsInputTypes): a SQL call
  * with `array<double>` fails analysis instead of silently misreading
  * 8-byte slots through `getFloat`.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null // HOF fold poisons
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("cosine", this, classOf[CosineSim].getName)
      s"""
         |Object r = $ref.compute($a, $b);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) r).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

object CosineSim {
  def cosineFused(a: Column, b: Column): Column =
    ColumnInterop.column(
      CosineSim(ColumnInterop.expression(a), ColumnInterop.expression(b)))
}
