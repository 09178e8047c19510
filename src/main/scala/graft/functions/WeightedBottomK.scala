package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable WEIGHTED bottom-k quantile sketch over (key, value, weight)
  * triples: keep the k triples with the smallest keys, where the key is
  * a weight-biased priority (Efraimidis–Spirakis A-ES, IPL 2006 — the
  * q124 machinery: key_i = ln(u_i)/w_i in log space, negated+quantized
  * so "keep k largest u^(1/w)" becomes an ascending-key bottom-k), and
  * the weights RIDE ALONG with the sampled values. The kept rows are a
  * weighted sample without replacement with inclusion probability
  * increasing in weight (PPSWOR — Cohen & Kaplan, "Summarizing data
  * using bottom-k sketches", PODC 2007, §2's exponential-rank family),
  * which is exactly the sample that estimates WEIGHTED quantiles: under
  * weight-proportional inclusion the plain order statistics of the
  * sample track the weighted rank of the population.
  *
  * This is the weighted, unknown-value-domain member of the quantile
  * family — q139 = unweighted known-domain histogram, q148 = weighted
  * known-domain histogram, q141 = unweighted unknown-domain bottom-k,
  * q151 (this sketch) = weighted unknown-domain. Like [[BottomK]] it
  * needs NO domain knowledge and no extra pass; unlike it there is no
  * clean DKW analogue for weight-biased sampling without replacement
  * (the classical bound assumes exchangeable uniform draws), so q151
  * deliberately emits NO rank-error bound — the documented trade, the
  * same way q141 documents rejecting GK/KLL. What IS guaranteed: a
  * group with n ≤ k rows keeps everything, and its quantiles are
  * computed EXACTLY from the full (value, weight) multiset
  * (WeightedBottomKQuantilesSpec pins it).
  *
  * Determinism (the gate contract): insert and merge are pure
  * set-minimum operations on lexicographically ordered (key, value,
  * weight) triples — multiset bottom-k, duplicates kept — so the state
  * is a pure function of the input multiset, independent of row order,
  * partitioning, and merge tree. Ties at the k-boundary are broken by
  * (value, weight), and fully tied triples are interchangeable, so the
  * kept (value, weight) MULTISET — the only thing the estimator reads —
  * is deterministic. DuckDB rebuilds the identical sample relationally
  * (`row_number() OVER (ORDER BY key, value, weight) <= k`).
  *
  * As an `Aggregator` it gets map-side partial aggregation: each
  * partition folds to ≤k triples and only those cross the shuffle
  * (≤24 KB per partition per group at k=1024) — the fixed-size-state
  * shape that replaces a full per-group weighted sort at 100 TB.
  */
object WeightedBottomK {

  class Agg(k: Int)
      extends Aggregator[(Long, Long, Long), Array[Long], Array[(Long, Long)]] {
    require(k > 0)

    // buffer = flattened sorted triples [k0,v0,w0, k1,v1,w1, ...], ≤ k

    /** First triple index sorting strictly after the probe in
      * (key, value, weight) lex order — insertion lands after equals,
      * keeping duplicates (multiset semantics).
      */
    private def insertPos(buf: Array[Long], nTriples: Int,
        key: Long, v: Long, w: Long): Int = {
      var lo = 0
      var hi = nTriples
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val bk = buf(3 * mid)
        val bv = buf(3 * mid + 1)
        val bw = buf(3 * mid + 2)
        val le = bk < key || (bk == key &&
          (bv < v || (bv == v && bw <= w)))
        if (le) lo = mid + 1 else hi = mid
      }
      lo
    }

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], x: (Long, Long, Long)): Array[Long] = {
      val key = x._1
      // genuine A-ES keys are ≥ 0 (−⌊ln(u)/w·1e4⌋·100 with ln(u) ≤ 0):
      // a negative key is the caller's null/invalid sentinel (NULL value
      // or non-positive weight coalesced to -1) — skipped, so hostile
      // rows neither crash the non-nullable UDAF path nor enter the
      // sample (the BottomK convention)
      if (key < 0) return buf
      val v = x._2
      val w = x._3
      val n = buf.length / 3
      val pos = insertPos(buf, n, key, v, w)
      if (n < k) {
        // growth phase: at most k allocations per partial, ever
        val out = new Array[Long](buf.length + 3)
        System.arraycopy(buf, 0, out, 0, 3 * pos)
        out(3 * pos) = key
        out(3 * pos + 1) = v
        out(3 * pos + 2) = w
        System.arraycopy(buf, 3 * pos, out, 3 * pos + 3, buf.length - 3 * pos)
        out
      } else if (pos < k) {
        // displaces the current maximum triple — steady state, shift IN
        // PLACE (the KmvSketch zero-allocation discipline; reduce owns
        // its buffer and the growth path never returns the shared
        // empty-array zero once non-empty)
        System.arraycopy(buf, 3 * pos, buf, 3 * pos + 3, 3 * (k - pos - 1))
        buf(3 * pos) = key
        buf(3 * pos + 1) = v
        buf(3 * pos + 2) = w
        buf
      } else buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // merge two sorted triple arrays, keep the k smallest triples
      // (duplicates kept — multiset semantics)
      val na = a.length / 3
      val nb = b.length / 3
      val outN = math.min(na + nb, k)
      val out = new Array[Long](3 * outN)
      var i = 0
      var j = 0
      var o = 0
      while (o < outN) {
        val takeA = j >= nb || (i < na && {
          val ak = a(3 * i); val bk = b(3 * j)
          ak < bk || (ak == bk && {
            val av = a(3 * i + 1); val bv = b(3 * j + 1)
            av < bv || (av == bv && a(3 * i + 2) <= b(3 * j + 2))
          })
        })
        if (takeA) {
          out(3 * o) = a(3 * i)
          out(3 * o + 1) = a(3 * i + 1)
          out(3 * o + 2) = a(3 * i + 2)
          i += 1
        } else {
          out(3 * o) = b(3 * j)
          out(3 * o + 1) = b(3 * j + 1)
          out(3 * o + 2) = b(3 * j + 2)
          j += 1
        }
        o += 1
      }
      out
    }

    /** Emit the kept (value, weight) pairs sorted by (value, weight)
      * ascending — the sample's weighted order statistics, a pure
      * function of the kept triple multiset; the keys have done their
      * job (selection) and don't ride further.
      */
    override def finish(buf: Array[Long]): Array[(Long, Long)] = {
      val n = buf.length / 3
      val pairs = new Array[(Long, Long)](n)
      var i = 0
      while (i < n) {
        pairs(i) = (buf(3 * i + 1), buf(3 * i + 2))
        i += 1
      }
      java.util.Arrays.sort(pairs, (p: (Long, Long), q: (Long, Long)) =>
        if (p._1 != q._1) java.lang.Long.compare(p._1, q._1)
        else java.lang.Long.compare(p._2, q._2))
      pairs
    }

    override def bufferEncoder: Encoder[Array[Long]] = KmvSketch.arrEnc
    override def outputEncoder: Encoder[Array[(Long, Long)]] = pairArrEnc
  }

  val pairArrEnc: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()

  /** Column function: `weightedBottomK(keyCol, valueCol, weightCol, k)`
    * usable in `agg(...)` — yields the `array<struct<_1,_2>>` of
    * (value, weight) pairs carried by the k smallest keys, sorted by
    * (value, weight). NULL handling is the CALLER's contract: gate the
    * key on value nullity AND weight positivity
    * (`when(v.isNotNull && w > 0, key).otherwise(lit(-1L))`) — negative
    * keys are skipped (see [[Agg.reduce]]), whereas a NULL reaching the
    * UDAF's primitive tuple input decodes as 0 and would silently
    * pollute the sample.
    */
  def weightedBottomK(key: Column, value: Column, weight: Column, k: Int): Column =
    udaf(new Agg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .apply(key, value, weight)

  /** The A-ES priority key in negated quantized log space — ONE
    * definition shared by the batch (q151) and stream
    * ([[graft.streaming.EventStream.windowedSketches]]) faces so they
    * can't fork. `h` is the row's affine∘polyhash draw in [0, 2^61−1)
    * (u = (h+1)/P uniform in (0, 1]); `w` is the POSITIVE weight as a
    * double. key = −⌊ln(u)/w · 1e4⌋·100: "keep k largest u^(1/w)"
    * becomes an ascending bottom-k on non-negative integer keys (one
    * MathLn call per row; the ⌊·1e4⌋·100 quantization is the q124 rule
    * that keeps the selected SET identical across engines despite
    * 1-ulp libm ln drift). Callers gate NULL value / non-positive
    * weight rows to the −1 sentinel BEFORE this key ever applies.
    */
  def aesKey(h: Column, w: Column): Column = {
    import org.apache.spark.sql.functions.{floor, lit}
    -(floor(MathLn.ln((h + lit(1L)).cast("double") /
      lit(MulMod61.P.toDouble)) / w * lit(1e4)).cast("long") * lit(100L))
  }

  /** Constants for the A-ES uniform-draw row-hash permutation
    * (independent of the MinHash/SimHash/mix/KMV/bottom-k/A-ES-sample
    * families — sample membership must not correlate with any other
    * hashed decision on the same rows).
    */
  val (wbA, wbB): (Long, Long) = {
    val rnd = new java.util.Random(20261214L)
    ((rnd.nextLong() & Long.MaxValue) % (MulMod61.P - 1) + 1,
      (rnd.nextLong() & Long.MaxValue) % MulMod61.P)
  }
}
