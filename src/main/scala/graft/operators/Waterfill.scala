package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Water-filling budget allocation — the training-mix primitive "give
  * every source its tokens up to a common cap C, where C is the
  * largest integer level whose total Σ min(tokens_g, C) fits the
  * budget" (the proportional-cap step of data-mixture balancing:
  * small sources keep everything, oversized sources are clipped to
  * the water level).
  *
  * Exactness: everything is integer — with groups sorted by
  * (tokens asc, group asc), rank k, exclusive prefix sum pre_k, the
  * candidate level c_k = max(B − pre_k, 0) div (n − k + 1) is a
  * non-negative floor division (floor = truncate in any engine), and
  * the water level is c_k of the FIRST k with c_k < tokens_k (all
  * smaller sources fit whole; the remainder splits evenly over the
  * n − k + 1 clipped ones). If no k binds, the budget covers
  * everything and C = max tokens. The max(·, 0) clamp never changes
  * the binding row — pre_k exceeds B only after the binding rank —
  * it just keeps every shipped intermediate non-negative (the
  * COVERAGE.md negatives rule).
  *
  * Scale shape: `totals` is GROUPS-sized (domains, not documents).
  * Rank and prefix sum run through [[PrefixSum]]'s two-phase scan —
  * never a partition-less window — so millions of groups stream; the
  * 1-row n/budget/cap tables broadcast back over the group table.
  * No driver state beyond the per-partition offsets PrefixSum already
  * collects.
  */
object Waterfill {

  /** Per-group allocation under a global budget: input `(groupCol,
    * tokCol)` rows (tokCol LongType, non-negative), output
    * `(groupCol, tokCol, cap, alloc)` with `alloc = least(tokens,
    * cap)` and one shared integer water level `cap`.
    */
  def allocate(totals: DataFrame, groupCol: String, tokCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(totals.schema(tokCol).dataType == LongType,
      s"$tokCol must be LongType")
    val order = Seq(tokCol, groupCol) // total order: tokens, then group
    val s1 = PrefixSum.exclusive(
      totals.withColumn("_one", lit(1L)), order, tokCol, "_pre")
    val s2 = PrefixSum.exclusive(s1, order, "_one", "_rnm1")
    val n = s2.agg(count(lit(1)).as("_n"))
    val scored = s2.crossJoin(broadcast(n))
      .withColumn("_ck",
        expr(s"GREATEST($budget - _pre, 0L) DIV (_n - _rnm1)"))
    val capRow = scored.agg(
      min(when(col("_ck") < col(tokCol),
        struct(col("_rnm1").as("rn"), col("_ck").as("ck")))).as("_b"),
      max(col(tokCol)).as("_mx"))
      .select(coalesce(col("_b.ck"), col("_mx"), lit(0L)).as("cap"))
    scored.crossJoin(broadcast(capRow))
      .withColumn("alloc", least(col(tokCol), col("cap")))
      .select(col(groupCol), col(tokCol), col("cap"), col("alloc"))
  }
}
