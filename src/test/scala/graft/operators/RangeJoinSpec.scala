package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.BroadcastRangeJoinExec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def referenceJoin(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals,
      points("p") >= intervals("lo") && points("p") <= intervals("hi"))

  test("pointInInterval matches the BETWEEN join on random data") {
    val rng = new scala.util.Random(3)
    val points = (1 to 500).map(i => (i, rng.nextInt(1000)))
      .toDF("id", "p")
    // overlapping intervals on purpose: multi-match per point
    val intervals = (1 to 40).map { i =>
      val lo = rng.nextInt(900); (i, lo, lo + rng.nextInt(200))
    }.toDF("iid", "lo", "hi")
    val got = RangeJoin
      .pointInInterval(points, intervals, $"p", $"lo", $"hi")
      .select($"id", $"iid").as[(Int, Int)].collect().toSet
    val want = referenceJoin(points, intervals)
      .select(points("id"), intervals("iid"))
      .as[(Int, Int)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must produce matches")
  }

  test("NULL point or bounds never match; empty interval side is empty") {
    val points = Seq((1, Some(5)), (2, None), (3, Some(100)))
      .toDF("id", "p")
    val intervals = Seq(
      (10, Some(0), Some(10)),
      (11, None, Some(10)),
      (12, Some(0), None)).toDF("iid", "lo", "hi")
    val got = RangeJoin
      .pointInInterval(points, intervals, $"p", $"lo", $"hi")
      .select($"id", $"iid").as[(Int, Int)].collect().toSet
    assert(got == Set((1, 10)))
    val empty = RangeJoin.pointInInterval(
      points, intervals.filter($"iid" < 0), $"p", $"lo", $"hi")
    assert(empty.count() == 0)
  }

  test("plans through BroadcastRangeJoinExec and survives downstream ops") {
    val points = (1 to 100).map(i => (i, i % 50)).toDF("id", "p")
    val intervals = Seq((1, 0, 9), (2, 10, 19)).toDF("iid", "lo", "hi")
    val joined = RangeJoin
      .pointInInterval(points, intervals, $"p", $"lo", $"hi")
      .groupBy($"iid").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"),
      s"expected custom exec in plan:\n$plan")
    val got = joined.as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 20L, 2 -> 20L))
  }

  test("GraftSparkExtensions registers the strategy with the extension point") {
    // can't build a second SparkContext in the shared-session suite;
    // verify the spark.sql.extensions entry point directly
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftSparkExtensions()(exts)
    val strategies = org.apache.spark.sql.graftbridge.Bridge
      .plannerStrategies(exts, spark)
    assert(strategies.contains(graft.plans.RangeJoinStrategy))
  }

  test("logical node plans only through the registered strategy") {
    import org.apache.spark.sql.graftbridge.Bridge
    val points = spark.range(0, 10).select(col("id").as("p"))
    val intervals = spark.range(0, 1)
      .select(lit(3L).as("lo"), lit(6L).as("hi"))
    val df = RangeJoin.pointInInterval(
      points, intervals, points("p"), col("lo"), col("hi"))
    assert(df.queryExecution.executedPlan.exists(
      _.isInstanceOf[BroadcastRangeJoinExec]))
    assert(df.count() == 4) // points 3,4,5,6
  }
}
