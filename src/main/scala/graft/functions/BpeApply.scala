package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge APPLICATION (q129) — the step-2 counterpart of q109's
  * pair statistics: apply a learned, rank-ordered merge list to every
  * whitespace word of a document and return
  * `struct(n_chars long, n_bpe long)` — symbol counts before and after
  * merging. This is the operator that prices a tokenizer against a
  * corpus (tokens-per-document drives training cost), fused into one
  * row-local pass: at 100 TB the whole computation is a map over the
  * corpus scan, no explode, no shuffle.
  *
  * Application semantics (GPT-2/Sennrich convention): per word, merges
  * apply in RANK order; each merge does ONE left-to-right pass over the
  * word's symbol sequence, merging every non-overlapping occurrence of
  * its (a, b) pair ("aaaa" + (a,a) → (aa)(aa); "aaaaa" → (aa)(aa)a).
  * Rank order alone is exact here because the merge table holds only
  * SINGLE-CHARACTER pairs (one training round): a merged 2-char symbol
  * can never feed a later merge, so "apply each merge once, in order"
  * equals "always merge the lowest-rank pair present". The DuckDB
  * oracle replays the same pass on a BRACKETED symbol string — every
  * symbol encoded chr(31)+sym+chr(30) — with non-overlapping
  * `replace`: two DISTINCT bracket chars make adjacent occurrences
  * char-disjoint (canonical left-to-right, "aaaaa" → (aa)(aa)a) and
  * the trailing chr(30) in the pattern forbids matching a PREFIX of a
  * longer merged symbol (a one-sided separator fails both ways —
  * measured: "⟂m⟂a" happily matched "m"+"al" and over-merged 15/31
  * vocab words before the bracketed encoding). A doc containing a
  * literal chr(30)/chr(31) would break the encoding — absent from the
  * corpus, and the kernel side is array-based and immune.
  *
  * Symbols are Unicode CODE POINTS (Java surrogate pairs stay one
  * symbol), matching DuckDB's per-character `string_split(word, '')`.
  * Tokenization is the [[Shingles]] convention (toLowerCase → trim →
  * `\s+` split); the merge list is O(model) — a driver-built constant
  * baked into the expression, the q110 inlined-model MO.
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_bpe", LongType, nullable = false)))
  override def prettyName: String = "bpe_apply"

  @transient private lazy val mergeA: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mergeB: Array[String] = merges.map(_._2).toArray

  /** One word → post-merge symbol count. Exposed for spec goldens. */
  def applyWord(word: String): Int = {
    // split into code-point symbols
    var n = word.codePointCount(0, word.length)
    if (n == 0) return 0
    val syms = new Array[String](n)
    var ci = 0
    var si = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val w = Character.charCount(cp)
      syms(si) = word.substring(ci, ci + w)
      ci += w
      si += 1
    }
    var m = 0
    while (m < mergeA.length && n > 1) {
      val a = mergeA(m)
      val b = mergeB(m)
      var i = 0
      var w = 0
      while (i < n) {
        if (i + 1 < n && syms(i) == a && syms(i + 1) == b) {
          syms(w) = a + b
          i += 2
        } else {
          syms(w) = syms(i)
          i += 1
        }
        w += 1
      }
      n = w
      m += 1
    }
    n
  }

  def compute(input: UTF8String): InternalRow = {
    val toks = input.toLowerCase.toString.trim.split("\\s+")
    var nChars = 0L
    var nBpe = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      nChars += t.codePointCount(0, t.length)
      nBpe += applyWord(t)
      i += 1
    }
    new GenericInternalRow(Array[Any](nChars, nBpe))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bpeApply", this,
        classOf[BpeApply].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

object BpeApply {
  def bpeApply(c: Column, merges: Seq[(String, String)]): Column =
    ColumnInterop.column(BpeApply(ColumnInterop.expression(c), merges))
}
