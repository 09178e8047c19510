package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing fingerprints (MOSS): tokenize → position-ordered
  * word-k-grams → md5 hex per gram → sliding window-of-w minima →
  * distinct minima, all in one JVM pass per row.
  *
  * The declarative formulation (nested `transform(sequence, slice(...))`
  * HOF chains with an md5 per element) measured 245s at sf0.1 — HOFs
  * are interpreted and every window `slice` re-materializes its
  * sub-array. This pass is the usual fused-Expression cure (cf.
  * [[Shingles]], [[MinHashSig]]).
  *
  * Parity contract with the DuckDB oracle (q56): identical tokenization
  * (`UTF8String.toLowerCase` + trim + `\s+` split, the proven
  * convention), md5 of the gram's UTF-8 bytes rendered as lowercase
  * hex (= Spark's `md5(cast binary)` = DuckDB `md5(varchar)`), and
  * LEXICOGRAPHIC min per window (hex strings; ASCII compare — what both
  * engines' `min` does on strings).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  private val HexDigits = "0123456789abcdef".toCharArray

  // One digest per thread: expression instances are shared across the
  // concurrently-running tasks of a partition's codegen stage, and
  // MessageDigest is stateful.
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(input: UTF8String): ArrayData = {
    val toks = input.toLowerCase.toString.trim.split("\\s+")
    // fewer than w windows ⇒ empty fingerprint set — decided from token
    // count alone, BEFORE paying any hashing
    if (toks.length < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val md = mdLocal.get()
    val nGrams = toks.length - k + 1
    val hashes = new Array[String](nGrams)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val digest = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = HexDigits((digest(b) >> 4) & 0xf)
        hex(b * 2 + 1) = HexDigits(digest(b) & 0xf)
        b += 1
      }
      hashes(i) = new String(hex)
      i += 1
    }
    val seen = new mutable.LinkedHashSet[String]
    i = 0
    while (i <= nGrams - w) {
      var min = hashes(i)
      var j = 1
      while (j < w) {
        if (hashes(i + j).compareTo(min) < 0) min = hashes(i + j)
        j += 1
      }
      seen.add(min)
      i += 1
    }
    new GenericArrayData(
      seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("winnow", this,
        classOf[WinnowFingerprints].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {
  def winnow(text: Column, k: Int, w: Int): Column =
    ColumnInterop.column(
      WinnowFingerprints(ColumnInterop.expression(text), k, w))
}
