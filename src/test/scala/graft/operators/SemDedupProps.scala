package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: [[Similarity.semDedup]] ≡ the sequential SemDeDup
  * reference — assign each vector to its highest-cosine centroid
  * (ties to the smaller centroid id), mark within-cluster pairs at
  * cosine ≥ τ, drop the larger id of every marked pair — independent
  * of partitioning. The reference folds doubles LEFT-TO-RIGHT exactly
  * like the codegen'd VectorDot, so threshold comparisons can't
  * diverge at the ulp.
  */
object SemDedupProps extends Properties("SemDedup") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val Dim = 6

  private val genIn
      : Gen[(List[(Long, Seq[Float])], List[(Long, Seq[Float])], Double)] =
    for {
      n <- Gen.chooseNum(1, 24)
      k <- Gen.chooseNum(1, 4)
      // small integer components: plenty of exact ties and repeated
      // vectors (cos = 1.0 duplicates), the hard cases
      vs <- Gen.listOfN(n, Gen.listOfN(Dim,
        Gen.chooseNum(-3, 3).map(_.toFloat + 0.5f)))
      cs <- Gen.listOfN(k, Gen.listOfN(Dim,
        Gen.chooseNum(-3, 3).map(_.toFloat + 0.5f)))
      tau <- Gen.oneOf(0.0, 0.3, 0.7, 0.95, 1.0)
    } yield (
      vs.zipWithIndex.map { case (v, i) => (i.toLong * 3 + 1, v: Seq[Float]) },
      cs.zipWithIndex.map { case (c, i) => (i.toLong, c: Seq[Float]) },
      tau)

  private def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def cos(a: Seq[Float], b: Seq[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private def ref(vs: List[(Long, Seq[Float])],
      cs: List[(Long, Seq[Float])], tau: Double)
      : Map[Long, (Long, Boolean)] = {
    val assign = vs.map { case (id, v) =>
      val best = cs.map { case (cid, c) => (cid, cos(v, c)) }
        .minBy { case (cid, s) => (-s, cid) }._1
      (id, v, best)
    }
    val drops = (for {
      (ia, va, ca) <- assign
      (ib, vb, cb) <- assign
      if ca == cb && ia < ib && cos(va, vb) >= tau
    } yield ib).toSet
    assign.map { case (id, _, c) => id -> (c, !drops(id)) }.toMap
  }

  property("semDedup == sequential reference (assignment, " +
    "within-cluster pairs, larger-id drop), any partitioning") =
    forAll(genIn) { case (vs, cs, tau) =>
      val vdf = vs.toDF("vec_id", "embedding").repartition(5)
      val cdf = cs.toDF("centroid_id", "centroid")
      val got = Similarity.semDedup(vdf, cdf, tau)
        .as[(Long, Long, Boolean)].collect()
        .map { case (id, c, kept) => id -> (c, kept) }.toMap
      val expected = ref(vs, cs, tau)
      got == expected
    }

  property("kept set is a maximal no-pair-above-tau set in the " +
    "pairwise sense: every dropped vector has a SMALLER surviving-" +
    "or-dropped witness at cos >= tau in its own cluster") =
    forAll(genIn) { case (vs, cs, tau) =>
      val vdf = vs.toDF("vec_id", "embedding").repartition(3)
      val cdf = cs.toDF("centroid_id", "centroid")
      val rows = Similarity.semDedup(vdf, cdf, tau)
        .as[(Long, Long, Boolean)].collect()
      val byId = vs.toMap
      val assignOf = rows.map(r => r._1 -> r._2).toMap
      rows.filter(!_._3).forall { case (id, c, _) =>
        vs.exists { case (other, v) =>
          other < id && assignOf(other) == c &&
            cos(v, byId(id)) >= tau
        }
      }
    }
}
