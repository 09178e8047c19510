package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of token positions covered by any occurrence of the given
  * k-shingles — the hot kernel of q123's boilerplate-strip accounting.
  *
  * Exists for the [[Shingles]] reason: the declarative form (positional
  * shingle explode → join → position-sequence explode → distinct) pays
  * interpreted-HOF shingle construction for EVERY window of EVERY doc
  * plus two corpus-keyed explodes; measured 5.3 s at sf0.1, the slowest
  * query in the registry. This kernel runs once per doc over its ≤10
  * matched templates (the per-source inventory cap): one tokenize, a
  * token-wise window compare with first-token early exit, a boolean
  * coverage mask — O(n_tokens · |patterns|) cheap compares, no
  * per-window string allocation, no positional explode through the
  * join. Overlapping occurrences collapse in the mask exactly as the
  * declarative DISTINCT collapsed them.
  *
  * Tokenization matches [[Shingles]] (UTF8String.toLowerCase → trim →
  * `\s+` split — locale-independent), so a pattern produced by the
  * fused shingle set always token-matches here.
  */
case class CoveredPositions(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] =
    Seq(StringType, ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "covered_positions"

  def compute(text: UTF8String, arr: ArrayData): Long = {
    val m = arr.numElements()
    if (m == 0) return 0L
    val toks = text.toLowerCase.toString.trim.split("\\s+")
    val n = toks.length
    if (n < k) return 0L
    // pre-split patterns; anything not exactly k tokens can never match
    val pats = new java.util.ArrayList[Array[String]](m)
    var pi = 0
    while (pi < m) {
      if (!arr.isNullAt(pi)) {
        val p = arr.getUTF8String(pi).toString.split(" ", -1)
        if (p.length == k) pats.add(p)
      }
      pi += 1
    }
    if (pats.isEmpty) return 0L
    val covered = new Array[Boolean](n)
    var i = 0
    while (i <= n - k) {
      var hit = false
      var p = 0
      while (!hit && p < pats.size()) {
        val pat = pats.get(p)
        var j = 0
        var ok = true
        while (ok && j < k) {
          if (toks(i + j) != pat(j)) ok = false
          j += 1
        }
        hit = ok
        p += 1
      }
      if (hit) {
        var j = 0
        while (j < k) { covered(i + j) = true; j += 1 }
      }
      i += 1
    }
    var c = 0L
    var x = 0
    while (x < n) { if (covered(x)) c += 1L; x += 1 }
    c
  }

  override protected def nullSafeEval(text: Any, arr: Any): Any =
    compute(text.asInstanceOf[UTF8String], arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a) => {
      val ref = ctx.addReferenceObj("coveredPositions", this,
        classOf[CoveredPositions].getName)
      s"${ev.value} = $ref.compute($t, $a);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CoveredPositions =
    copy(left = newLeft, right = newRight)
}

object CoveredPositions {
  def coveredPositions(text: Column, shingles: Column, k: Int): Column =
    ColumnInterop.column(CoveredPositions(
      ColumnInterop.expression(text), ColumnInterop.expression(shingles), k))
}
