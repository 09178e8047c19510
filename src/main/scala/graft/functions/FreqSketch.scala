package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Misra-Gries heavy-hitter summary over string keys — the
  * bounded-memory half of two-pass top-k at corpus scale (q86).
  *
  * At most `k` counters live at any time: an incoming key either
  * increments its counter, claims a free slot, or (when all k slots are
  * taken by OTHER keys) decrements every counter — the classic
  * frequent-items algorithm. Merging sums two summaries and truncates
  * back to k by subtracting the (k+1)-th largest count (Agarwal et al.,
  * "Mergeable Summaries"): the total undercount stays ≤ n/(k+1) under
  * ANY merge tree, so every key with true count > n/(k+1) is GUARANTEED
  * present in the final summary. Stored counts are underestimates and
  * merge-order-dependent — which is why q86 treats the sketch only as a
  * candidate generator and recounts candidates exactly (that second
  * pass makes the end result deterministic and oracle-checkable).
  *
  * As an `Aggregator` it gets map-side partial aggregation: each
  * executor folds its rows into one ≤k-entry map and only those maps
  * cross the shuffle — O(k) bytes per partition regardless of input
  * size, the property that makes global top-k viable at 100 TB where an
  * exact word→count shuffle would be corpus-sized.
  */
object FreqSketch {

  class Agg(k: Int) extends
      Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0)

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], key: String): Map[String, Long] = {
      if (key == null) return buf
      buf.get(key) match {
        case Some(c) => buf.updated(key, c + 1)
        case None if buf.size < k => buf.updated(key, 1L)
        case None =>
          // all k slots held by other keys: decrement everyone, drop
          // the zeros (the incoming key's +1 cancels against its own
          // decrement, so it is not inserted)
          buf.collect { case (w, c) if c > 1 => (w, c - 1) }
      }
    }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (acc, (w, c)) =>
        acc.updated(w, acc.getOrElse(w, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest count; at most k survive
        val cut = summed.valuesIterator.toArray.sortBy(-_).apply(k)
        summed.collect { case (w, c) if c > cut => (w, c - cut) }
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf
    override def bufferEncoder: Encoder[Map[String, Long]] = mapEnc
    override def outputEncoder: Encoder[Map[String, Long]] = mapEnc
  }

  val mapEnc: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  /** Column function: `freqSketch(keyCol, k)` usable in `agg(...)` —
    * yields a `MapType(String, Long)` summary column.
    */
  def freqSketch(key: Column, k: Int): Column =
    udaf(new Agg(k), org.apache.spark.sql.Encoders.STRING).apply(key)
}
