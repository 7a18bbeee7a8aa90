package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** Similarity.kmeansFit vs a sequential driver-side Lloyd's reference
  * on random small corpora: same seeding (vec_id < k), same cosine
  * assignment with (cos desc, centroid_id) tie-break, same fixed-point
  * centroid update — the distributed loop must be value-identical,
  * not just "close", because the oracle compare is a hash. Duplicate
  * vectors (tie stress) and dropped empty clusters are covered by the
  * generator's small value alphabet.
  */
object KmeansProps extends Properties("Kmeans") {
  private lazy val spark = SparkSpec.session

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  // ---- reference implementation --------------------------------------
  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def updateRef(vs: Seq[(Long, Seq[Float])],
      cents: Seq[(Long, Seq[Double])]): Seq[(Long, Int, Long, Long)] = {
    val assigns = vs.map { case (vid, ev) =>
      val e = ev.map(_.toDouble)
      val en = math.sqrt(dot(e, e))
      val best = cents.map { case (cid, c) =>
        (cid, dot(e, c) / (en * math.sqrt(dot(c, c))))
      }.sortBy { case (cid, cos) => (-cos, cid) }.head._1
      (best, e)
    }
    assigns.groupBy(_._1).toSeq.flatMap { case (cid, members) =>
      val n = members.size
      members.head._2.indices.map { d =>
        val s = members.map(m => math.floor(m._2(d) * 1000000).toLong).sum
        (cid, d, math.floor(s.toDouble / n).toLong, n.toLong)
      }
    }
  }

  private def fitRef(vs: Seq[(Long, Seq[Float])], k: Int, rounds: Int)
      : Seq[(Long, Int, Long, Long)] = {
    var cents: Seq[(Long, Seq[Double])] = vs.filter(_._1 < k)
      .sortBy(_._1).map { case (id, v) => (id, v.map(_.toDouble)) }
    var out = updateRef(vs, cents)
    for (_ <- 2 to rounds) {
      cents = out.groupBy(_._1).toSeq.sortBy(_._1).map { case (cid, ds) =>
        (cid, ds.sortBy(_._2).map(_._3.toDouble / 1000000.0))
      }
      out = updateRef(vs, cents)
    }
    out
  }

  private val caseGen: Gen[(List[(Long, Seq[Float])], Int, Int)] = for {
    dims <- Gen.chooseNum(2, 5)
    n <- Gen.chooseNum(4, 20)
    vecs <- Gen.listOfN(n,
      Gen.listOfN(dims, Gen.chooseNum(1, 1000).map(_ / 100.0f)))
    k <- Gen.chooseNum(2, math.min(4, n))
    rounds <- Gen.chooseNum(1, 3)
  } yield (vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) },
    k, rounds)

  property("kmeansFit == sequential Lloyd's reference") =
    forAll(caseGen) { case (vs, k, rounds) =>
      import spark.implicits._
      val got = Similarity.kmeansFit(
          vs.toDF("vec_id", "embedding"), k, rounds)
        .as[(Long, Int, Long, Long)].collect().toSet
      got == fitRef(vs, k, rounds).toSet
    }
}
