package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck invariants for [[Dedup.removeWorse]] against the
  * in-memory pairwise rule: on ANY pair relation over a small id
  * space (dense collisions, duplicate pairs, chains), the removed
  * set must equal "ids that lose at least one pair by
  * (priority desc, id asc)" — including the transitive subtlety that
  * a pair's winner may itself lose elsewhere.
  */
object RemoveWorseProps extends Properties("Dedup.removeWorse") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val N = 8L // id space; priorities collide on purpose

  private val caseGen: Gen[(List[(Long, Long)], Map[Long, Long])] =
    for {
      nPairs <- Gen.choose(0, 12)
      pairs <- Gen.listOfN(nPairs, for {
        a <- Gen.choose(0L, N - 1)
        b <- Gen.choose(0L, N - 1)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
      prios <- Gen.listOfN(N.toInt, Gen.choose(0L, 3L))
    } yield (pairs, prios.zipWithIndex
      .map { case (p, i) => i.toLong -> p }.toMap)

  private def brute(pairs: Seq[(Long, Long)], prio: Map[Long, Long])
      : Set[Long] =
    pairs.map { case (a, b) =>
      if (prio(a) > prio(b)) b
      else if (prio(b) > prio(a)) a
      else math.max(a, b)
    }.toSet

  property("removed ≡ brute-force per-pair losers") =
    forAll(caseGen) { case (pairs, prio) =>
      val pairsDf = pairs.toDF("id_a", "id_b")
      val prioDf = prio.toSeq.toDF("id", "p")
      val got = Dedup.removeWorse(pairsDf, prioDf, "id", "p")
        .as[Long].collect().toSet
      got == brute(pairs, prio)
    }
}
