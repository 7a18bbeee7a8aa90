package graft.functions

/** Sizing arithmetic for the HLL++ sketches behind
  * `approx_count_distinct` (q9/q66/q87's at-scale route), mirroring
  * Spark's own register math
  * (`org.apache.spark.sql.catalyst.expressions.aggregate
  * .HyperLogLogPlusPlusHelper`: p = ⌈2·log₂(1.106/rsd)⌉, m = 2^p
  * 6-bit registers packed 10 per 64-bit word).
  *
  * The precision-cost trade this makes explicit:
  *
  *  - rsd 0.05 (Spark default): p=9,  m=512    → ~0.4 KiB / group
  *  - rsd 0.02:                 p=12, m=4096   → ~3.2 KiB / group
  *  - rsd 0.01 (q9/q66 choice): p=14, m=16384 → ~12.8 KiB / group
  *
  * Halving rsd roughly quadruples the registers (m ∝ 1/rsd²), so the
  * 5σ-headroom choice of 0.01 costs ~32× the default's memory PER
  * GROUP. At q9's 5 groups that is 64 KiB total — irrelevant. At a
  * 10⁶-group GROUP BY it is ~13 GiB of aggregation-buffer state per
  * task doing the merge, which is the regime where [[rsdForBudget]]
  * should pick the rsd instead of a constant: estimation error
  * concentrates per group, but sketch memory multiplies across them.
  */
object Sketches {

  /** Spark's HLL++ precision for a requested relative standard
    * deviation — the exponent p with m = 2^p registers. */
  def hllPrecision(rsd: Double): Int = {
    require(rsd > 0.0 && rsd < 1.0, s"rsd must be in (0,1), got $rsd")
    math.ceil(2.0 * math.log(1.106 / rsd) / math.log(2.0)).toInt
  }

  /** Bytes of aggregation-buffer state per group at the given rsd:
    * 2^p 6-bit registers, 10 per 64-bit word (Spark's packing). */
  def hllSketchBytes(rsd: Double): Long = {
    val m = 1L << hllPrecision(rsd)
    ((m + 9) / 10) * 8
  }

  /** Finest candidate rsd whose TOTAL sketch footprint across
    * `nGroups` groups fits `budgetBytes`; falls back to the coarsest
    * candidate when even it exceeds the budget (estimation still
    * works — the caller is trading accuracy for survival). Use this
    * instead of a constant rsd whenever the GROUP BY cardinality is
    * data-dependent.
    */
  def rsdForBudget(nGroups: Long, budgetBytes: Long = 64L << 20,
      candidates: Seq[Double] = Seq(0.01, 0.02, 0.05)): Double = {
    require(nGroups > 0, s"nGroups must be positive, got $nGroups")
    val sorted = candidates.sorted
    sorted.find(r => hllSketchBytes(r) * nGroups <= budgetBytes)
      .getOrElse(sorted.last)
  }
}
