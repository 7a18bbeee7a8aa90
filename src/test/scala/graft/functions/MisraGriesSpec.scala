package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[MisraGries]] — the bounded heavy-hitter summary behind
  * q127_heavy_hitters. The load-bearing property is the SUPERSET
  * guarantee: with capacity k, every item of frequency > n/(k+1) must
  * appear in the candidate set NO MATTER how partials split and merge
  * — tested with adversarially small capacities so the decrement and
  * merge-trim paths actually run (a large-capacity test would just be
  * an exact count).
  */
class MisraGriesSpec extends SparkSpec {
  import org.apache.spark.sql.Encoders

  private def runMG(items: Seq[String], k: Int): Seq[String] = {
    // many tiny partitions force real partial-buffer merges
    spark.createDataset(items)(Encoders.STRING).repartition(7)
      .toDF("tok")
      .agg(MisraGries.candidates(k)(col("tok")).as("c"))
      .head().getSeq[String](0)
  }

  test("superset guarantee under adversarial noise, k=4 (distributed)") {
    // one true heavy hitter ('a', 200/595 > n/5) drowned in 300
    // distinct rare tokens that keep evicting buffer entries
    val items = Seq.fill(200)("a") ++ Seq.fill(50)("b") ++
      Seq.fill(45)("c") ++ (1 to 300).map(i => s"rare_$i")
    val n = items.size
    val cands = runMG(new scala.util.Random(7).shuffle(items), k = 4)
    assert(cands.size <= 4)
    val mustSurvive = items.groupBy(identity).collect {
      case (t, xs) if xs.size * 5 > n => t
    }
    mustSurvive.foreach(t => assert(cands.contains(t),
      s"$t (heavy) missing from $cands"))
  }

  test("exact when vocabulary fits capacity") {
    val items: Seq[String] =
      Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z")
    assert(runMG(items, k = 8).sorted == Seq("x", "y", "z"))
  }

  test("merge trims to capacity and keeps heavies") {
    val mg = new MisraGries(3)
    val a = Map("x" -> 100L, "y" -> 5L, "z" -> 3L)
    val b = Map("w" -> 80L, "v" -> 2L, "y" -> 4L)
    val m = mg.merge(a, b)
    assert(m.size <= 3)
    assert(m.contains("x") && m.contains("w"))
  }
}
