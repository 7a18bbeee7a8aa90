package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: [[Similarity.semDedup]] ≡ the sequential SemDeDup
  * reference — assign each vector to its highest-cosine centroid
  * (ties to the smaller centroid id), mark within-cluster pairs at
  * cosine ≥ τ, close pairs into connected components, keep exactly
  * the MIN id of every component (the paper's keep-one-per-cluster
  * semantics) — independent of partitioning. The reference folds
  * doubles LEFT-TO-RIGHT exactly like the codegen'd VectorDot, so
  * threshold comparisons can't diverge at the ulp.
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
    val pairs = for {
      (ia, va, ca) <- assign
      (ib, vb, cb) <- assign
      if ca == cb && ia < ib && cos(va, vb) >= tau
    } yield (ia, ib)
    // union-find min-label closure: keep exactly the component min
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    assign.map { case (id, _, c) =>
      id -> (c, !parent.contains(id) || find(id) == id)
    }.toMap
  }

  property("semDedup == sequential reference (assignment, " +
    "within-cluster pairs, component min-label keep), any " +
    "partitioning") =
    forAll(genIn) { case (vs, cs, tau) =>
      val vdf = vs.toDF("vec_id", "embedding").repartition(5)
      val cdf = cs.toDF("centroid_id", "centroid")
      val got = Similarity.semDedup(vdf, cdf, tau)
        .as[(Long, Long, Boolean)].collect()
        .map { case (id, c, kept) => id -> (c, kept) }.toMap
      val expected = ref(vs, cs, tau)
      got == expected
    }

  property("kept vectors are an independent set of the pair graph: " +
    "no two kept vectors in one cluster at cos >= tau (two kept " +
    "duplicates would mean their components wrongly failed to merge)") =
    forAll(genIn) { case (vs, cs, tau) =>
      val vdf = vs.toDF("vec_id", "embedding").repartition(3)
      val cdf = cs.toDF("centroid_id", "centroid")
      val rows = Similarity.semDedup(vdf, cdf, tau)
        .as[(Long, Long, Boolean)].collect()
      val byId = vs.toMap
      val kept = rows.filter(_._3)
      kept.forall { case (ia, ca, _) =>
        kept.forall { case (ib, cb, _) =>
          ia >= ib || ca != cb || cos(byId(ia), byId(ib)) < tau
        }
      }
    }

  property("CHAIN a-b-c (cos(a,b),cos(b,c) >= tau, cos(a,c) < tau) " +
    "keeps exactly {a}; V-shape (a-c, b-c pairs only) keeps exactly " +
    "{a} too — one representative per COMPONENT, not per-pair drops " +
    "(the pre-r11 rule kept {a,b} on the V)") = {
    val centroid = List((0L, Seq(1f, 1f, 0f, 0f, 0f, 0f)))
    val cdf = centroid.toDF("centroid_id", "centroid")
    val e1 = Seq(1f, 0f, 0f, 0f, 0f, 0f)
    val e2 = Seq(0f, 1f, 0f, 0f, 0f, 0f)
    val mid = Seq(1f, 1f, 0f, 0f, 0f, 0f)
    // chain: 1-(1,0), 2-(1,1), 3-(0,1): pairs (1,2),(2,3) at ~0.707
    val chain = List((1L, e1), (2L, mid), (3L, e2))
      .toDF("vec_id", "embedding").repartition(2)
    val gotChain = Similarity.semDedup(chain, cdf, 0.7)
      .as[(Long, Long, Boolean)].collect()
      .filter(_._3).map(_._1).toSet
    // V: 1-(1,0), 2-(0,1), 3-(1,1): pairs (1,3),(2,3); cos(1,2)=0
    val v = List((1L, e1), (2L, e2), (3L, mid))
      .toDF("vec_id", "embedding").repartition(2)
    val gotV = Similarity.semDedup(v, cdf, 0.7)
      .as[(Long, Long, Boolean)].collect()
      .filter(_._3).map(_._1).toSet
    gotChain == Set(1L) && gotV == Set(1L)
  }
}
