package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint: h = Σ b_i · B^(n-1-i)
  * (mod 2^64, via native long overflow) over the UTF-8 bytes, base
  * B = 1000003. A native Catalyst expression with `doGenCode` so the hot
  * path stays inside whole-stage codegen — the preferred shape for custom
  * scalar ops at 100 TB (vs a Scala UDF, which breaks codegen and adds
  * serialization).
  *
  * The rolling property (h(s++t) = h(s)·B^|t| + h(t)) makes fingerprints
  * of chunked documents composable without re-reading the prefix.
  */
case class PolyHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] = Seq(StringType)

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * PolyHash.Base + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        byte[] $bytes = $c.getBytes();
        long $h = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $h = $h * ${PolyHash.Base}L + ($bytes[$i] & 0xffL);
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Base: Long = 1000003L

  /** Column-level entry point: `poly_hash($"text")`. */
  def polyHash(c: Column): Column =
    ColumnInterop.column(PolyHash(ColumnInterop.expression(c)))
}

/** Rolling hash of an `array<long>` into [0, 2^61): h ← (h·B + v) mod
  * (2^61−1). The LSH band-key hash over MinHash-signature slices — same
  * [[MulMod61]] arithmetic as the signature itself, so band keys are
  * recomputable by the DuckDB oracle (`MulMod61.sqlPh61Longs`). Values
  * must be in [0, 2^61) (signature positions are; the Long.MaxValue
  * empty-set sentinel is outside the domain — and since every
  * shingle-less doc shares the SAME sentinel signature they would all
  * collide in every band, so callers filter empty shingle sets out
  * before banding: see DedupQueries.bandKeys).
  */
case class PolyHashLongs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash_longs"

  def compute(input: ArrayData): Long = {
    val n = input.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      var s = MulMod61.mulmod(h, MulMod61.B) + input.getLong(i)
      if (s >= MulMod61.P) s -= MulMod61.P
      h = s
      i += 1
    }
    h
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("phl", this, classOf[PolyHashLongs].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): PolyHashLongs = copy(child = newChild)
}

object PolyHashLongs {
  def polyHashLongs(c: Column): Column =
    ColumnInterop.column(PolyHashLongs(ColumnInterop.expression(c)))
}

/** [[MulMod61.polyHash61]] as a codegen expression: the 61-bit rolling
  * byte hash of a string, into [0, 2^61−1). The string-side entry into
  * the MulMod61 family for per-VALUE hashing (KMV distinct sketches,
  * q88) — compose with [[Affine61]] for an independent permutation.
  * DuckDB replays it as `MulMod61.sqlPh61`.
  */
case class PolyHash61Str(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash61"

  override protected def nullSafeEval(input: Any): Any =
    MulMod61.polyHash61(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MulMod61.polyHash61($c);")

  override protected def withNewChildInternal(
      newChild: Expression): PolyHash61Str = copy(child = newChild)
}

object PolyHash61Str {
  def polyHash61Str(c: Column): Column =
    ColumnInterop.column(PolyHash61Str(ColumnInterop.expression(c)))
}
