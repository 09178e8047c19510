package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** True iff the two texts share an EXACT contiguous run of ≥ k tokens —
  * the verification stage of q128's exact-substring dedup (Lee et al.
  * 2022's "Deduplicating Training Data Makes Language Models Better"
  * criterion, span threshold in tokens).
  *
  * A shared run of length ≥ k exists iff the docs share at least one
  * k-gram (any k-token window inside the run), so the check is
  * O(nA + nB): index every k-gram of the left text by a rolling
  * polynomial hash (natural Long wraparound — quality only affects the
  * number of exact compares, never the answer), then roll over the
  * right text and TOKEN-COMPARE on hash hits. Exactness comes from the
  * final compare, not the hash: a collision costs k token equals and
  * is then rejected, so the result is hash-independent — which is what
  * lets the DuckDB oracle define truth via plain gram-string equality
  * with no hash replication.
  *
  * Tokenization matches [[Shingles]]/[[WinnowFingerprints]]
  * (UTF8String.toLowerCase → trim → `\s+` split), so a candidate pair
  * produced by the winnowed fingerprint join is verified on the same
  * token sequence that generated its fingerprints.
  *
  * Runs once per CANDIDATE pair (rare), never per corpus pair; at
  * 100 TB the cost is bounded by candidate count × document length.
  */
case class SharedSpan(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] =
    Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "shared_span"

  private val B = 1000003L

  def compute(a: UTF8String, b: UTF8String): Boolean = {
    val ta = a.toLowerCase.toString.trim.split("\\s+")
    val tb = b.toLowerCase.toString.trim.split("\\s+")
    if (ta.length < k || tb.length < k) return false
    // B^(k-1) for the rolling removal term (Long wraparound arithmetic)
    var bk = 1L
    var i = 1
    while (i < k) { bk *= B; i += 1 }
    val ha = new Array[Long](ta.length)
    i = 0
    while (i < ta.length) { ha(i) = ta(i).hashCode.toLong; i += 1 }
    // index left k-gram hashes → start positions (positions list kept
    // for the exact compare on hash hits)
    val index = new java.util.HashMap[java.lang.Long, java.util.ArrayList[Integer]]()
    var h = 0L
    i = 0
    while (i < ta.length) {
      h = if (i < k) h * B + ha(i)
      else (h - ha(i - k) * bk) * B + ha(i)
      if (i >= k - 1) {
        val start = Integer.valueOf(i - k + 1)
        var lst = index.get(h)
        if (lst == null) { lst = new java.util.ArrayList[Integer](1); index.put(h, lst) }
        lst.add(start)
      }
      i += 1
    }
    // roll the right text; exact token compare on every hash hit
    val hb = new Array[Long](tb.length)
    i = 0
    while (i < tb.length) { hb(i) = tb(i).hashCode.toLong; i += 1 }
    h = 0L
    i = 0
    while (i < tb.length) {
      h = if (i < k) h * B + hb(i)
      else (h - hb(i - k) * bk) * B + hb(i)
      if (i >= k - 1) {
        val lst = index.get(h)
        if (lst != null) {
          val pb = i - k + 1
          var li = 0
          while (li < lst.size()) {
            val pa = lst.get(li).intValue()
            var j = 0
            var ok = true
            while (ok && j < k) {
              if (ta(pa + j) != tb(pb + j)) ok = false
              j += 1
            }
            if (ok) return true
            li += 1
          }
        }
      }
      i += 1
    }
    false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val ref = ctx.addReferenceObj("sharedSpan", this,
        classOf[SharedSpan].getName)
      s"${ev.value} = $ref.compute($l, $r);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SharedSpan =
    copy(left = newLeft, right = newRight)
}

object SharedSpan {
  def sharedSpan(a: Column, b: Column, k: Int): Column =
    ColumnInterop.column(SharedSpan(
      ColumnInterop.expression(a), ColumnInterop.expression(b), k))
}

/** Count of token positions in `text` covered by some k-gram it shares
  * with ANY of the partner texts — q130's strip-accounting kernel (the
  * [[CoveredPositions]] idea applied to q128's cross-document exact
  * spans): every position inside a shared run of ≥ k tokens lies in a
  * shared k-window, so the coverage mask over verified window hits
  * counts exactly the tokens a Lee-et-al span-strip would delete.
  *
  * One call per document over its few candidate partners (the q123
  * "fused kernel over a small per-doc set" MO — no positional explode
  * ever crosses an exchange): all partners' k-grams are rolling-hash
  * indexed once, the document rolls through, and every hash hit is
  * exact-token verified before marking `[i, i+k)` covered. Overlaps
  * collapse in the mask. O(Σ|partners| + |text|) plus verification.
  */
case class SharedCoverage(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnInterop.AbstractType] =
    Seq(StringType, org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "shared_coverage"

  private val B = 1000003L

  def compute(text: UTF8String,
      partners: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val m = partners.numElements()
    if (m == 0) return 0L
    val tb = text.toLowerCase.toString.trim.split("\\s+")
    if (tb.length < k) return 0L
    var bk = 1L
    var x = 1
    while (x < k) { bk *= B; x += 1 }
    // index every partner's k-gram hashes -> (partner, start)
    val index = new java.util.HashMap[java.lang.Long, java.util.ArrayList[Array[Int]]]()
    val ptoks = new Array[Array[String]](m)
    var pi = 0
    while (pi < m) {
      if (!partners.isNullAt(pi)) {
        val ta = partners.getUTF8String(pi).toLowerCase.toString
          .trim.split("\\s+")
        ptoks(pi) = ta
        if (ta.length >= k) {
          var h = 0L
          var i = 0
          while (i < ta.length) {
            h = if (i < k) h * B + ta(i).hashCode
            else (h - ta(i - k).hashCode.toLong * bk) * B + ta(i).hashCode
            if (i >= k - 1) {
              var lst = index.get(h)
              if (lst == null) {
                lst = new java.util.ArrayList[Array[Int]](1)
                index.put(h, lst)
              }
              lst.add(Array(pi, i - k + 1))
            }
            i += 1
          }
        }
      }
      pi += 1
    }
    if (index.isEmpty) return 0L
    val covered = new Array[Boolean](tb.length)
    var h = 0L
    var i = 0
    while (i < tb.length) {
      h = if (i < k) h * B + tb(i).hashCode
      else (h - tb(i - k).hashCode.toLong * bk) * B + tb(i).hashCode
      if (i >= k - 1) {
        val lst = index.get(h)
        if (lst != null) {
          val pb = i - k + 1
          var li = 0
          var hit = false
          while (!hit && li < lst.size()) {
            val e = lst.get(li)
            val ta = ptoks(e(0))
            val pa = e(1)
            var j = 0
            var ok = true
            while (ok && j < k) {
              if (ta(pa + j) != tb(pb + j)) ok = false
              j += 1
            }
            hit = ok
            li += 1
          }
          if (hit) {
            var j = pb
            while (j <= i) { covered(j) = true; j += 1 }
          }
        }
      }
      i += 1
    }
    var c = 0L
    i = 0
    while (i < tb.length) { if (covered(i)) c += 1L; i += 1 }
    c
  }

  override protected def nullSafeEval(text: Any, arr: Any): Any =
    compute(text.asInstanceOf[UTF8String],
      arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a) => {
      val ref = ctx.addReferenceObj("sharedCoverage", this,
        classOf[SharedCoverage].getName)
      s"${ev.value} = $ref.compute($t, $a);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SharedCoverage =
    copy(left = newLeft, right = newRight)
}

object SharedCoverage {
  def sharedCoverage(text: Column, partners: Column, k: Int): Column =
    ColumnInterop.column(SharedCoverage(
      ColumnInterop.expression(text), ColumnInterop.expression(partners), k))
}
