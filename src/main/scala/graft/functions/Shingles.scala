package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused distinct word-k-shingles: lowercase → trim → whitespace split →
  * k-gram join → dedup, in one JVM pass.
  *
  * Exists for the same reason as [[MinHashSig]]: Spark's higher-order
  * functions (`transform`/`filter`/`aggregate`) are never part of
  * whole-stage codegen — each element evaluation goes through an
  * interpreted lambda with boxing, and the shingle construction was the
  * measured bottleneck of the dedup pipeline (3 HOF passes ≈ 8s of the
  * 9s q36 at sf0.1). Semantics are identical to the declarative
  * `TextFunctions.shingleSet` (first-occurrence order preserved).
  */
case class Shingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  def compute(input: UTF8String): ArrayData = {
    // UTF8String.toLowerCase = Spark's own lower(): locale-independent,
    // unlike String.toLowerCase which follows the JVM default locale
    // (Turkish-I etc. would desync results from the DuckDB oracle).
    val toks = input.toLowerCase.toString.trim.split("\\s+")
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(
      seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("shingles", this,
        classOf[Shingles].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  def shingles(c: Column, k: Int): Column =
    ColumnInterop.column(Shingles(ColumnInterop.expression(c), k))
}
