package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused token/stopword counter: ONE tokenize pass per row returning
  * `struct(n_tokens int, n_stop int)`.
  *
  * The declarative q28/q30 formulation re-tokenizes per derived column
  * and counts stopwords with an interpreted `filter` HOF (HOFs never
  * join whole-stage codegen). Both outputs are plain integer counts of
  * the SAME tokenization Spark's `split(lower(trim(text)), "\\s+")`
  * produces (the convention [[Shingles]] already proved oracle-parity
  * for), so ratios/scores built on top are bit-identical — asserted in
  * FunctionsSpec against the HOF forms.
  */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))
  override def prettyName: String = "text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  def compute(input: UTF8String): InternalRow = {
    val toks = input.toLowerCase.toString.trim.split("\\s+")
    var nStop = 0
    var i = 0
    while (i < toks.length) {
      if (stopSet.contains(toks(i))) nStop += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](toks.length, nStop))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("textstats", this,
        classOf[TextStats].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  def textStats(c: Column, stopwords: Seq[String]): Column =
    ColumnInterop.column(TextStats(ColumnInterop.expression(c), stopwords))
}

/** Fused language-ID: marker-word hit counting for every language in ONE
  * tokenize pass, argmax with the declared tie order ('und' when nothing
  * hits) — replacing one interpreted `filter` HOF per language. Exact
  * integer/ordering semantics of [[TextFunctions.langId]] (FunctionsSpec
  * asserts equality).
  */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] = Seq(StringType)

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  @transient private lazy val langs: Array[String] = markers.map(_._1).toArray
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    markers.map { case (_, ws) =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(s.add)
      s
    }.toArray

  def compute(input: UTF8String): UTF8String = {
    val toks = input.toLowerCase.toString.trim.split("\\s+")
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      var l = 0
      while (l < langs.length) {
        if (sets(l).contains(toks(i))) counts(l) += 1
        l += 1
      }
      i += 1
    }
    var best = 0
    var l = 0
    while (l < counts.length) {
      if (counts(l) > best) best = counts(l)
      l += 1
    }
    if (best == 0) return UTF8String.fromString("und")
    l = 0
    while (l < counts.length) {
      if (counts(l) == best) return UTF8String.fromString(langs(l))
      l += 1
    }
    UTF8String.fromString("und") // unreachable
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("langid", this,
        classOf[LangIdExpr].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  def langIdFused(c: Column, markers: Seq[(String, Seq[String])]): Column =
    ColumnInterop.column(LangIdExpr(ColumnInterop.expression(c), markers))
}
