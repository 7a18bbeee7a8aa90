package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.graftbridge.Bridge
import graft.plans.{BroadcastRangeJoin, RangeJoinStrategy}

/** DataFrame-level API for the custom broadcast range join
  * ([[graft.plans.BroadcastRangeJoinExec]]): inner-join each left row
  * to every interval row with `lo <= point <= hi`, O(log intervals)
  * per left row instead of BroadcastNestedLoopJoin's full scan.
  *
  * `point`/`lo`/`hi` must be integral columns (they are cast to LONG
  * here); date columns should be turned into day numbers upstream
  * (e.g. `datediff(d, lit("1970-01-01"))`). `left` and `right` must
  * not share lineage (alias one side first, as with any self-join).
  */
object RangeJoin {

  /** Resolve a column against one side by running it through the
    * analyzer (a Column off the public API wraps a lazy, unresolved
    * ColumnNode — a custom logical node never triggers its
    * conversion, so resolve it here and take the resolved child).
    */
  private def resolvedLong(df: DataFrame, c: Column): Expression =
    df.select(c.cast("long")).queryExecution.analyzed match {
      case Project(Seq(a: Alias), _) => a.child
      case Project(Seq(e), _) => e
      case other => sys.error(s"unexpected plan resolving $c: $other")
    }

  def pointInInterval(left: DataFrame, right: DataFrame,
      point: Column, lo: Column, hi: Column): DataFrame = {
    val spark = left.sparkSession
    Bridge.addStrategy(spark, RangeJoinStrategy)
    Bridge.ofRows(spark, BroadcastRangeJoin(
      left.queryExecution.analyzed,
      right.queryExecution.analyzed,
      resolvedLong(left, point),
      resolvedLong(right, lo),
      resolvedLong(right, hi)))
  }
}
