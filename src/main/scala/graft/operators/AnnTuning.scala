package graft.operators

/** Corpus-size-derived ANN parameters — the formulas behind the fixture
  * constants in [[VectorQueries]] (`NCells`/`NProbe`, 8 hyperplanes,
  * `PqM`/`PqK`), codified from SCALING.md §"ANN tuning constants".
  *
  * The oracle-checked queries keep their FIXED constants because the
  * DuckDB oracles replay them value-for-value (NOTES.md records that
  * coupling); this object is the production sizing path a deployment
  * calls once per corpus — the dials are √/log functions of corpus size
  * n, so they move one notch per ~10× growth, never per query.
  *
  * Sources are the published guidelines the SCALING.md section cites:
  * IVF cell count c·√n (FAISS guideline, c in 4..16), LSH plane count
  * log₂(n/s) for target bucket occupancy s, PQ M×K=8..16 subspaces of
  * 256 codes. All pure integer math — deterministic, driver-side, O(1).
  */
object AnnTuning {

  /** IVF coarse-quantizer cell count: NCells ≈ c·√n, clamped so a tiny
    * corpus still trains (≥ 4 cells) and cells never outnumber vectors.
    * c=8 is the midpoint of the published 4..16 band.
    */
  def ivfCells(n: Long, c: Double = 8.0): Int = {
    require(n > 0, s"corpus size must be positive, got $n")
    val raw = math.round(c * math.sqrt(n.toDouble))
    // floor of 4 for trainability, but never more cells than vectors
    math.min(n, math.max(4L, raw)).toInt
  }

  /** IVF probe count for a target recall r: the measured recall curves
    * (SCALING.md table) track NProbe/NCells roughly linearly until
    * saturation, so NProbe ≈ r·NCells, at least 1, at most NCells.
    */
  def ivfProbes(nCells: Int, targetRecall: Double): Int = {
    require(targetRecall > 0 && targetRecall <= 1.0,
      s"recall in (0,1], got $targetRecall")
    math.max(1, math.min(nCells, math.ceil(targetRecall * nCells).toInt))
  }

  /** Hyperplane-LSH plane count: b ≈ log₂(n/s) for expected bucket
    * occupancy s (the per-query candidate budget). Clamped to [4, 30]:
    * fewer than 4 planes leaves O(n²/16) self-join volume; 2³⁰ buckets
    * exceeds any practical corpus. Self-join candidate volume is
    * ≈ n²/2^b uniform — budget-check with [[lshCandidateVolume]].
    */
  def lshPlanes(n: Long, targetBucket: Long = 1000L): Int = {
    require(n > 0 && targetBucket > 0)
    val b = math.ceil(math.log(n.toDouble / targetBucket) / math.log(2.0))
    math.max(4, math.min(30, if (b.isNaN) 4 else b.toInt))
  }

  /** Expected self-join candidate volume for b planes over n vectors
    * (uniform-occupancy estimate n²/2^b) — the cost axis the plane
    * count trades against recall.
    */
  def lshCandidateVolume(n: Long, planes: Int): Double =
    n.toDouble * n.toDouble / math.pow(2.0, planes.toDouble)

  /** PQ subspace count M: dims split into 8..16 subspaces (production
    * band), preferring the largest M in band that divides dims evenly;
    * falls back to the fixture's dims/16 split when dims < 128.
    */
  def pqSubspaces(dims: Int): Int = {
    require(dims > 0)
    (16 to 8 by -1).find(m => dims % m == 0 && dims / m >= 2)
      .getOrElse(math.max(1, dims / 16))
  }

  /** PQ codebook size K per subspace: 256 (8-bit codes) once the corpus
    * can populate it (the K=16→64 recall doubling measured at SF is the
    * small-corpus image of this dial); shrink on tiny corpora so codes
    * stay meaningfully occupied (~≥ 4 members/code).
    */
  def pqCodebook(n: Long): Int = {
    require(n > 0)
    math.min(256L, math.max(16L, java.lang.Long.highestOneBit(n / 4))).toInt
  }

  /** Bytes per PQ-encoded vector: M·log₂(K)/8 — the memory/bandwidth
    * win that makes PQ the 100 TB scan format (64-dim f32 = 256 B;
    * M=4,K=64 → 3 B).
    */
  def pqBytesPerVector(m: Int, k: Int): Double =
    m * (math.log(k.toDouble) / math.log(2.0)) / 8.0
}
