package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Sizing math for the HLL++ precision-cost trade (q9/q66 policy). */
class SketchesSpec extends AnyFunSuite {

  test("precision matches Spark's register formula at the documented points") {
    // p = ceil(2·log2(1.106/rsd)) — same constants as Spark's
    // HyperLogLogPlusPlusHelper
    assert(Sketches.hllPrecision(0.05) === 9)
    assert(Sketches.hllPrecision(0.02) === 12)
    assert(Sketches.hllPrecision(0.01) === 14)
  }

  test("sketch bytes: rsd 0.01 costs ~32x the 0.05 default per group") {
    val b05 = Sketches.hllSketchBytes(0.05)
    val b01 = Sketches.hllSketchBytes(0.01)
    assert(b05 === ((512L + 9) / 10) * 8)   // 416 B
    assert(b01 === ((16384L + 9) / 10) * 8) // ~12.8 KiB
    // register ratio is exactly 32 (2^14/2^9); byte ratio lands at
    // ~31.5 because word-packing rounds each size up independently
    assert(b01.toDouble / b05 > 31.0 && b01.toDouble / b05 < 33.0)
  }

  test("rsdForBudget keeps 0.01 for few groups, coarsens for many") {
    // q9's regime: 5 groups → the 5-sigma rsd fits trivially
    assert(Sketches.rsdForBudget(5L) === 0.01)
    // 10^6 groups at 12.8 KiB/group = ~13 GiB > 64 MiB budget → the
    // gate must coarsen; 0.05's 416 B x 10^6 = ~0.4 GiB still exceeds
    // the default budget, so it falls back to the coarsest candidate
    assert(Sketches.rsdForBudget(1000000L) === 0.05)
    // 10^5 groups at 12.8 KiB = ~1.3 GiB: fits a 2 GiB budget at 0.01,
    // only the 3.3 KiB rsd-0.02 sketch under 1 GiB
    assert(Sketches.rsdForBudget(100000L, budgetBytes = 2L << 30) === 0.01)
    assert(Sketches.rsdForBudget(100000L, budgetBytes = 1L << 30) === 0.02)
    assert(Sketches.rsdForBudget(1000000L, budgetBytes = 4L << 30) === 0.02)
  }

  test("monotone: finer rsd never costs fewer bytes") {
    val rs = Seq(0.5, 0.2, 0.1, 0.05, 0.02, 0.01, 0.005)
    rs.sliding(2).foreach { case Seq(coarse, fine) =>
      assert(Sketches.hllSketchBytes(fine) >= Sketches.hllSketchBytes(coarse))
    }
  }
}
