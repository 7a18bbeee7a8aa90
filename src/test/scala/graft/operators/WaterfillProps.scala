package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: water-filling allocation ≡ a sequential reference
  * (sorted scan for the first binding rank), plus the two defining
  * invariants — feasibility (Σ alloc ≤ budget when anything clips)
  * and maximality (cap + 1 would overshoot) — independent of
  * partitioning.
  */
object WaterfillProps extends Properties("Waterfill") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val gen: Gen[(List[Long], Long)] = for {
    toks <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000L)).map(_.take(20))
    budget <- Gen.chooseNum(0L, 12000L)
  } yield (toks, budget)

  private def refCap(sorted: Seq[Long], budget: Long): Long = {
    val n = sorted.size
    var pre = 0L
    var k = 0
    while (k < n) {
      val ck = math.max(budget - pre, 0L) / (n - k)
      if (ck < sorted(k)) return ck
      pre += sorted(k)
      k += 1
    }
    sorted.max // budget covers everything
  }

  property("allocate == sequential reference; feasible and maximal") =
    forAll(gen) { case (toks, budget) =>
      val rows = toks.zipWithIndex.map { case (t, i) => (s"g$i", t) }
      val df = rows.toDF("g", "toks").repartition(4)
      val got = Waterfill.allocate(df, "g", "toks", budget)
        .as[(String, Long, Long, Long)].collect()
        .map { case (g, t, c, a) => g -> ((t, c, a)) }.toMap
      val cap = refCap(rows.map(_._2).sorted, budget)
      val want = rows.map { case (g, t) =>
        g -> ((t, cap, math.min(t, cap)))
      }.toMap
      val total = rows.map(_._2).sum
      val allocSum = want.values.map(_._3).sum
      val feasible = total <= budget || allocSum <= budget
      val maximal = total <= budget ||
        rows.map { case (_, t) => math.min(t, cap + 1) }.sum > budget
      got == want && feasible && maximal
    }
}
