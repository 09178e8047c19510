package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the corpus-derived ANN sizing formulas. The
  * documented examples come from SCALING.md §"ANN tuning constants"
  * (themselves the published FAISS/LSH guidelines).
  */
class AnnTuningSpec extends AnyFunSuite {

  test("ivfCells follows c·√n and the documented 1e9 band") {
    // n=1e9 → 1e5..5e5 cells across the c=4..16 band (SCALING.md)
    assert(AnnTuning.ivfCells(1000000000L, c = 4.0) >= 100000)
    assert(AnnTuning.ivfCells(1000000000L, c = 16.0) <= 520000)
    // monotone in n
    val ns = Seq(100L, 10000L, 1000000L, 100000000L)
    val cells = ns.map(AnnTuning.ivfCells(_))
    assert(cells == cells.sorted)
    // clamps: never more cells than vectors; floor of 4 when n allows
    assert(AnnTuning.ivfCells(2) === 2)
    assert(AnnTuning.ivfCells(4) === 4)
    assert(AnnTuning.ivfCells(1000000L) === 8000)
  }

  test("ivfProbes scales with target recall and stays in [1, NCells]") {
    assert(AnnTuning.ivfProbes(100, 0.3) === 30)
    assert(AnnTuning.ivfProbes(100, 1.0) === 100)
    assert(AnnTuning.ivfProbes(100, 0.001) === 1)
    assert(AnnTuning.ivfProbes(3, 0.9) === 3)
  }

  test("lshPlanes hits the documented n=1e9, s=1e3 → b=20 example") {
    assert(AnnTuning.lshPlanes(1000000000L, 1000L) === 20)
    // more planes → smaller buckets; candidate volume shrinks 2× per plane
    val v20 = AnnTuning.lshCandidateVolume(1000000000L, 20)
    val v21 = AnnTuning.lshCandidateVolume(1000000000L, 21)
    assert(math.abs(v20 / v21 - 2.0) < 1e-9)
    // expected bucket occupancy at the derived b is within 2× of target
    val b = AnnTuning.lshPlanes(1000000000L, 1000L)
    val occ = 1000000000L.toDouble / math.pow(2.0, b.toDouble)
    assert(occ <= 1000.0 && occ > 250.0)
    // clamps
    assert(AnnTuning.lshPlanes(10L, 1000L) === 4)
    assert(AnnTuning.lshPlanes(Long.MaxValue / 2, 1L) === 30)
  }

  test("pqSubspaces prefers the 8..16 production band when dims allow") {
    assert(AnnTuning.pqSubspaces(128) === 16)
    assert(AnnTuning.pqSubspaces(768) === 16)
    assert(AnnTuning.pqSubspaces(96) === 16)
    // 64 dims: 16 divides it and 64/16=4 ≥ 2 → in-band
    assert(AnnTuning.pqSubspaces(64) === 16)
    // tiny dims (no in-band split leaves ≥2 dims/subspace) collapse to 1
    assert(AnnTuning.pqSubspaces(8) === 1)
  }

  test("pqCodebook saturates at 256 and shrinks on tiny corpora") {
    assert(AnnTuning.pqCodebook(1000000L) === 256)
    assert(AnnTuning.pqCodebook(1024L) === 256)
    assert(AnnTuning.pqCodebook(500L) === 64)
    assert(AnnTuning.pqCodebook(10L) === 16)
    // ~≥4 members per code once past the floor
    val n = 500L
    assert(n / AnnTuning.pqCodebook(n) >= 4)
  }

  test("pqBytesPerVector reproduces the documented 3-byte code") {
    assert(AnnTuning.pqBytesPerVector(4, 64) === 3.0)
    assert(AnnTuning.pqBytesPerVector(16, 256) === 16.0)
  }
}
