package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra via the sweep-line pattern: decompose each
  * interval into a +1 boundary at its start and a −1 boundary at its
  * (exclusive) end, sort boundaries, and a running sum of the deltas
  * is the number of intervals open at every instant.
  *
  * One union + one window per partition key — no self-join over the
  * O(n²) overlapping-pair space. At 100 TB scale the boundaries
  * shuffle once on the partition key; each partition's sweep is a
  * single sorted pass, the same discipline as the sessionize and
  * streak operators.
  */
object Intervals {

  /** Peak number of concurrently open intervals per partition key.
    *
    * Ends are EXCLUSIVE: an interval ending at instant `t` does not
    * overlap one starting at `t` (the −1 delta sorts before the +1 at
    * equal boundaries). Determinism under ties: rows with an equal
    * (boundary, delta) key all carry the same delta, so the running
    * sum's maximum is invariant to their relative order.
    *
    * @param df       one row per interval
    * @param partCols sweep partition (e.g. a day column)
    * @param startCol inclusive start boundary column name
    * @param endCol   exclusive end boundary column name
    * @return one row per partition key: partCols, `max_concurrent`
    */
  def maxConcurrent(df: DataFrame, partCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    val keep = partCols.map(col)
    val deltas = df
      .select(keep :+ col(startCol).as("_b") :+ lit(1).as("_d"): _*)
      .unionByName(
        df.select(keep :+ col(endCol).as("_b") :+ lit(-1).as("_d"): _*))
    val w = Window.partitionBy(keep: _*).orderBy(col("_b"), col("_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("_run", sum(col("_d")).over(w))
      .groupBy(keep: _*)
      .agg(max(col("_run")).as("max_concurrent"))
  }

  /** Merge overlapping or touching intervals per partition key into
    * maximal disjoint "islands" (interval union / coalescing).
    *
    * Sweep formulation: order intervals by (start, end); a row opens a
    * new island exactly when its start lies strictly after the maximum
    * end seen so far (ends are exclusive, and a touching pair — end =
    * next start — merges). The island id is then a running count of
    * the open flags, and one aggregation per (key, island) yields the
    * merged bounds. One shuffle on the partition key, a single sorted
    * pass per partition — never the O(n²) overlap self-join.
    *
    * Deterministic under ties: duplicate (start, end) rows see a
    * prior max-end ≥ their start (any interval's end ≥ its own start),
    * so they can never open an island regardless of their relative
    * order, and island numbering depends only on the sorted boundary
    * sequence.
    *
    * @return one row per island: partCols, `island` (1-based ordinal
    *         within the key), merged `startCol`/`endCol`, `n_merged`
    */
  def mergeOverlaps(df: DataFrame, partCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    val keep = partCols.map(col)
    val ord = Window.partitionBy(keep: _*)
      .orderBy(col(startCol), col(endCol))
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("_pme", max(col(endCol)).over(prev))
      .withColumn("_open",
        when(col("_pme").isNull || col("_pme") < col(startCol), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("_open")).over(run))
      .groupBy(keep :+ col("island"): _*)
      .agg(
        min(col(startCol)).as(startCol),
        max(col(endCol)).as(endCol),
        count(lit(1)).as("n_merged"))
  }
}
