package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable MinHash set-union aggregate: element-wise minimum over the
  * per-document signatures of a group, yielding the signature of the
  * UNION of the underlying shingle sets — the defining sketch property
  * `sig(A ∪ B) = min(sig(A), sig(B))`, exact, not approximate.
  *
  * This is the engine's UDAF surface (SURVEY.md §2.10: the reference has
  * none; a `TypedImperativeAggregate`-style partial aggregation of
  * signatures was the anticipated extension). As an `Aggregator` it gets
  * map-side partial aggregation for free: each executor folds its rows
  * into one k-long buffer and only buffers cross the shuffle — O(k) per
  * group per partition regardless of group size, which is what makes
  * cluster-level / corpus-level signatures viable at 100 TB (e.g. one
  * signature per dup-cluster from DedupCluster, or per source/domain for
  * cross-corpus overlap estimation).
  *
  * Empty/NULL inputs keep the Long.MaxValue sentinel convention of
  * [[MinHashSig]] (signature of the empty set matches nothing).
  */
object MinHashUnion {

  class Agg(k: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

    override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] = {
      if (sig == null) return buf
      require(sig.length == k,
        s"signature length ${sig.length} != aggregate k=$k")
      var i = 0
      while (i < k) {
        if (sig(i) < buf(i)) buf(i) = sig(i)
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) {
        if (b(i) < a(i)) a(i) = b(i)
        i += 1
      }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = MinHashUnion.arrayLongEnc
    override def outputEncoder: Encoder[Array[Long]] = MinHashUnion.arrayLongEnc
  }

  /** Typed encoder for the signature arrays (ArrayType(LongType) both as
    * the aggregation buffer crossing the shuffle and as the column I/O).
    */
  val arrayLongEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Column function: `minhashUnion(sigCol, k)` usable in `agg(...)`. */
  def minhashUnion(sig: Column, k: Int): Column =
    udaf(new Agg(k), arrayLongEnc).apply(sig)
}
