package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Point-in-interval range join as a whole custom operator — the
  * SURVEY §2.3 J8 shape (`p.first_season <= y.season`) taken past what
  * stock Catalyst offers. Spark plans a non-equi join as
  * BroadcastNestedLoopJoin: every left row probes EVERY right row,
  * O(|L|·|R|) comparisons. This operator sorts the broadcast interval
  * side once and binary-searches it per left row — O(|L|·log|R| + hits),
  * the difference between hours and seconds when the interval table has
  * thousands of rows and the left side has billions.
  *
  * Wiring demonstrated here (the full custom-operator stack):
  * logical node ([[BroadcastRangeJoin]]) → planner strategy
  * ([[RangeJoinStrategy]], registered via `SparkSessionExtensions
  * .injectPlannerStrategy` — [[GraftSparkExtensions]] — or at runtime
  * through `spark.experimental.extraStrategies`) → physical operator
  * ([[BroadcastRangeJoinExec]]).
  *
  * Semantics: INNER join of left rows to every interval row with
  * lo <= point <= hi; NULL point/lo/hi rows never match (same as the
  * BETWEEN predicate). point/lo/hi must be integral (LongType after
  * the API wrapper's cast) — dates go through day numbers upstream.
  */
case class BroadcastRangeJoin(
    left: LogicalPlan, right: LogicalPlan,
    point: Expression, lo: Expression, hi: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastRangeJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[BroadcastRangeJoin]] into [[BroadcastRangeJoinExec]]. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: BroadcastRangeJoin =>
      BroadcastRangeJoinExec(
        planLater(j.left), planLater(j.right), j.point, j.lo, j.hi) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions=graft.plans.GraftSparkExtensions` injects the
  * strategy at session build; `graft.operators.RangeJoin` also adds it
  * to a live session through `experimental.extraStrategies`.
  */
class GraftSparkExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(
      e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => RangeJoinStrategy)
    e.injectOptimizerRule(_ => LevenshteinBandRule)
  }
}

/** Physical operator: collect + sort the interval side on the driver
  * (it is the broadcast-small side by contract), broadcast (lo, hi,
  * row) arrays plus a running-max-of-hi array, then stream the left
  * side: binary search for the last interval with lo <= point, walk
  * left while the running max-hi can still reach the point. The walk
  * visits only candidate intervals — for non-overlapping intervals
  * that is exactly the hits.
  */
case class BroadcastRangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    point: Expression, lo: Expression, hi: Expression)
  extends SparkPlan {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def children: Seq[SparkPlan] = Seq(left, right)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan =
    copy(left = newChildren(0), right = newChildren(1))
  override def outputPartitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    val intervals = right.executeCollect().flatMap { r =>
      val l = loB.eval(r)
      val h = hiB.eval(r)
      if (l == null || h == null) None
      else Some((l.asInstanceOf[Long], h.asInstanceOf[Long], r))
    }.sortBy(_._1)
    val los = intervals.map(_._1)
    val his = intervals.map(_._2)
    val rows: Array[InternalRow] = intervals.map(_._3)
    // maxHi(i) = max of his(0..i): lets the backward walk stop as soon
    // as no earlier interval can still cover the point
    val maxHi = new Array[Long](his.length)
    var m = Long.MinValue
    var i = 0
    while (i < his.length) {
      m = math.max(m, his(i)); maxHi(i) = m; i += 1
    }
    val bc = sparkContext.broadcast((los, his, maxHi, rows))
    val pointB = BindReferences.bindReference(point, left.output)
    val outAttrs = output
    left.execute().mapPartitions { iter =>
      val (los, his, maxHi, rows) = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { lrow =>
        val pv = pointB.eval(lrow)
        if (pv == null || los.length == 0) Iterator.empty
        else {
          val p = pv.asInstanceOf[Long]
          // binary search: first index with lo > p
          var a = 0
          var b = los.length
          while (a < b) {
            val mid = (a + b) >>> 1
            if (los(mid) <= p) a = mid + 1 else b = mid
          }
          var idx = a - 1
          val buf = Vector.newBuilder[InternalRow]
          while (idx >= 0 && maxHi(idx) >= p) {
            // projection output is buffered across yields → copy
            if (his(idx) >= p) buf += proj(joined(lrow, rows(idx))).copy()
            idx -= 1
          }
          buf.result().iterator
        }
      }
    }
  }
}
