package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck invariants for [[MisraGries]], run directly against the
  * aggregator's reduce/merge (no Spark roundtrip — the property is
  * about the summary algebra itself): under ANY partition split and
  * ANY left-fold merge order, the candidate set stays ≤ k and
  * contains every item with frequency > n/(k+1) (Agarwal et al.,
  * "Mergeable Summaries").
  */
object MisraGriesProps extends Properties("MisraGries") {

  private val streamGen: Gen[(List[String], Int, Long)] = for {
    nHeavy <- Gen.choose(1, 3)
    heavyReps <- Gen.choose(40, 150)
    nRare <- Gen.choose(0, 150)
    k <- Gen.choose(4, 8)
    seed <- Gen.choose(0L, 10000L)
  } yield {
    val items = (1 to nHeavy).flatMap(h => List.fill(heavyReps)(s"H$h")) ++
      (1 to nRare).map(i => s"r$i")
    (items.toList, k, seed)
  }

  property("bounded size + heavy-hitter superset under random splits") =
    forAll(streamGen) { case (items0, k, seed) =>
      val rnd = new scala.util.Random(seed)
      val items = rnd.shuffle(items0)
      val mg = new MisraGries(k)
      // split into 1..8 random partitions, reduce each, merge left-fold
      val nParts = 1 + rnd.nextInt(8)
      val parts = items.zipWithIndex.groupBy(_._2 % nParts)
        .values.map(_.map(_._1))
      val merged = parts
        .map(p => p.foldLeft(mg.zero)(mg.reduce))
        .foldLeft(mg.zero)(mg.merge)
      val cands = mg.finish(merged)
      val n = items.size
      val heavies = items.groupBy(identity).collect {
        case (t, xs) if xs.size * (k + 1) > n => t
      }
      cands.size <= k && heavies.forall(cands.contains)
    }
}
