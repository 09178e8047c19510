package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of the UTF-8 byte distribution (nats) — the
  * compressibility quality signal (Gopher/Dolma-family filters):
  * keyboard mash and single-char runs score near 0, natural prose
  * ~2.5-3.1, uniform random bytes toward ln(256). One fused pass per
  * row: a 256-counter histogram, then Σ −p·ln p folded in ASCENDING
  * BYTE ORDER with `Math.log`. The fixed fold order makes the
  * ASSOCIATION replayable by the DuckDB oracle's ordered
  * `list_reduce`, but ln itself is only 1-ulp portable across libms
  * (one doc in 5000 differed in the last bit at sf0.1) — so q90
  * quantizes the row output to integer micro-nats rather than claiming
  * bit-exact doubles. All-one-symbol inputs return +0.0 from both
  * engines (the `-0.0` IEEE negation artifact is normalized away;
  * repr-compare would flag it).
  *
  * Byte (not codepoint) distribution: locale- and decode-free, and at
  * 100 TB the scan never allocates beyond the 256 counters. TESTDATA
  * documents are ASCII, so the oracle's per-CHARACTER `ord` histogram
  * coincides; non-ASCII corpora shift the scale, not the ordering of
  * mash vs prose.
  */
case class ByteEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "byte_entropy"

  def compute(input: UTF8String): Double = {
    val bytes = input.getBytes
    if (bytes.length == 0) return 0.0
    val counts = new Array[Int](256)
    var i = 0
    while (i < bytes.length) {
      counts(bytes(i) & 0xff) += 1
      i += 1
    }
    val n = bytes.length.toDouble
    var s = 0.0
    var b = 0
    while (b < 256) {
      if (counts(b) > 0) {
        val p = counts(b) / n
        s += p * Math.log(p)
      }
      b += 1
    }
    if (s == 0.0) 0.0 else -s
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("byteEntropy", this,
        classOf[ByteEntropy].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): ByteEntropy =
    copy(child = newChild)
}

object ByteEntropy {
  def byteEntropy(c: Column): Column =
    ColumnInterop.column(ByteEntropy(ColumnInterop.expression(c)))
}
