package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.BloomMightContain

/** Bloom-pruned semi join — the scale pattern for "filter a huge fact
  * by membership in a selective dim" when the dim is too big to
  * broadcast as a hash relation but its KEY SET fits a few megabytes
  * of bloom bits.
  *
  * Two stages, both distributed:
  *  1. build: a distributed bloom-filter aggregate over the dim keys
  *     (`DataFrameStatFunctions.bloomFilter` — partial filters built
  *     per partition, OR-merged on the driver);
  *  2. probe: the fact scans through a codegen'd
  *     [[graft.plans.BloomMightContain]] predicate, discarding the
  *     (1 − fpp) of non-matching rows BEFORE the shuffle, then an
  *     exact left-semi join removes the false positives.
  *
  * The result is bit-identical to the plain semi join (the bloom only
  * prunes; the exact join decides), but the shuffle moves ~selectivity
  * × fact instead of the whole fact — at 100 TB that IS the query.
  * Spark's runtime row-filtering (`spark.sql.optimizer.runtimeFilter`)
  * applies the same idea automatically when its eligibility rules
  * match; this operator makes it explicit and reusable (build once,
  * probe many facts).
  *
  * Reference anchor: the broadcast-join labs
  * (`3-spark-fundamentals/notebooks/homework_spark_1.ipynb:94-96`)
  * cover the dim-fits-in-memory regime; this is the next regime up.
  */
object BloomJoin {

  /** @param fact          large side, pruned then exactly semi-joined
    * @param dim           side whose keys define membership
    * @param factKey       long-typed join column on the fact
    * @param dimKey        long-typed join column on the dim
    * @param expectedItems sizing for the bloom bits (overestimate is
    *                      safe: bits scale linearly, ~9.6 bits/item
    *                      at fpp 0.01)
    * @param fpp           target false-positive rate of the pruning
    *                      pass (correctness is unaffected)
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01)
      : DataFrame = {
    // empty dim: Spark's bloomFilter aggregate returns a null buffer
    // (NPE in readFrom) — and the semi join is vacuously empty anyway
    if (dim.isEmpty) return fact.limit(0)
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    fact
      .filter(BloomMightContain(col(factKey).cast("long"), bloom))
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }
}
