package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.SparkSpec

/** The banded-Levenshtein optimizer rule: fires in filtering contexts,
  * never in projections, and preserves results exactly.
  */
class LevenshteinBandSpec extends SparkSpec {
  import spark.implicits._
  Bridge.addOptimization(spark, LevenshteinBandRule)

  private val words = {
    val rng = new scala.util.Random(3)
    val alpha = "abcde"
    Seq.tabulate(120)(i =>
      (i.toLong, Seq.fill(3 + rng.nextInt(6))(
        alpha(rng.nextInt(alpha.length))).mkString))
  }

  test("rewritten filter returns exactly the unbanded matches") {
    val df = words.toDF("id", "w")
    val got = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
      .filter(levenshtein($"a.w", $"b.w") <= 1)
      .select($"a.id", $"b.id").as[(Long, Long)].collect().toSet
    // expected: compute distances WITHOUT a filter context (projection
    // — the rule must not touch it), then filter driver-side
    val expected = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
      .select($"a.id", $"b.id", levenshtein($"a.w", $"b.w").as("d"))
      .as[(Long, Long, Int)].collect()
      .filter(_._3 <= 1).map(t => (t._1, t._2)).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("the optimized plan carries the band and the threshold DP") {
    // parquet source: a LocalRelation test frame would be folded away
    // by ConvertToLocalRelation before the rule could be observed
    val part = graft.core.Tables.load(spark, sfDir, "part")
    val p = part.filter(levenshtein($"p_name", lit("abc")) <= 2)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("abs((length(p_name"),
      s"length band expected in:\n$p")
    assert(p.contains("Some(2)) >= 0"),
      s"threshold form with >= 0 guard expected in:\n$p")
  }

  test("projections are left untouched (null semantics differ there)") {
    val part = graft.core.Tables.load(spark, sfDir, "part")
    val p = part
      .select(levenshtein($"p_name", lit("abc")).as("d"))
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("abs("), s"rule must not fire in Project:\n$p")
  }

  test("null inputs drop rows identically under the rewrite") {
    val df = Seq(Some("abc"), None, Some("abd")).toDF("w")
    val n = df.filter(levenshtein($"w", lit("abc")) <= 1).count()
    assert(n == 2L)
  }
}
