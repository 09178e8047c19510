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
