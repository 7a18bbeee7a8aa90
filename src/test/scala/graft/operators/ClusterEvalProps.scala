package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: [[ClusterEval.silhouette]] ≡ a brute-force sequential
  * reference (floor-mean centroids, exact squared L2, the same
  * sign-guarded integer divisions), independent of partitioning —
  * including the single-label degeneracy (b falls back to a,
  * silhouette 0) and zero-distance points.
  */
object ClusterEvalProps extends Properties("ClusterEval") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val Dim = 4

  private val genPts: Gen[List[(Long, Long, Seq[Long])]] = for {
    n <- Gen.chooseNum(1, 24)
    nLabels <- Gen.chooseNum(1, 4)
    pts <- Gen.listOfN(n, for {
      l <- Gen.chooseNum(0, nLabels - 1)
      v <- Gen.listOfN(Dim, Gen.chooseNum(0L, 7L))
    } yield (l.toLong, v: Seq[Long]))
  } yield pts.zipWithIndex.map { case ((l, v), i) => (i.toLong, l, v) }

  private def sdiv(x: Long, y: Long): Long =
    if (x >= 0) x / y else -((-x) / y)

  private def ref(pts: List[(Long, Long, Seq[Long])])
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    val cents: Map[Long, Seq[Long]] = pts.groupBy(_._2).map {
      case (l, ps) =>
        l -> (0 until Dim).map(d => ps.map(_._3(d)).sum / ps.size)
    }
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val per = pts.map { case (id, l, v) =>
      val a = d2(v, cents(l))
      val others = cents.collect { case (cl, c) if cl != l => d2(v, c) }
      val b = if (others.isEmpty) a else others.min
      val m = math.max(a, b)
      val sil =
        if (m == 0) 0L
        else if (b >= a) 10000L * (b - a) / m
        else -(10000L * (a - b) / m)
      (l, a, b, sil)
    }
    per.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, g) =>
      (l, g.size.toLong, g.map(_._2).sum, g.map(_._3).sum,
        g.count { case (_, a, b, _) => b > a }.toLong,
        sdiv(g.map(_._4).sum, g.size.toLong))
    }
  }

  property("silhouette == brute-force reference") =
    forAll(genPts) { pts =>
      val df = pts.toDF("id", "label", "codes").repartition(5)
      val got = ClusterEval.silhouette(df, "id", "label", "codes")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      got == ref(pts)
    }

  property("daviesBouldin == brute-force reference incl. the " +
    "merged-centroid sentinel and the single-label empty result") =
    forAll(genPts) { pts =>
      val cents: Map[Long, Seq[Long]] = pts.groupBy(_._2).map {
        case (l, ps) =>
          l -> (0 until Dim).map(d => ps.map(_._3(d)).sum / ps.size)
      }
      def d2(a: Seq[Long], b: Seq[Long]): Long =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val stats = pts.groupBy(_._2).map { case (l, ps) =>
        l -> ((ps.size.toLong, ps.map(p => d2(p._3, cents(l))).sum))
      }
      val want = stats.keys.toSeq.sorted.flatMap { li =>
        val (ni, ai) = stats(li)
        val rs = stats.keys.toSeq.sorted.filter(_ != li).map { lj =>
          val (nj, aj) = stats(lj)
          val dij = d2(cents(li), cents(lj))
          val r =
            if (dij == 0) 1000000000L
            else ((1000 * (BigInt(ai) * nj + BigInt(aj) * ni))
              / (BigInt(ni) * nj * dij)).toLong
          (r, lj)
        }
        if (rs.isEmpty) None
        else {
          val (r, lj) = rs.maxBy { case (r, lj) => (r, -lj) }
          Some((li, ni, ai, lj, r))
        }
      }
      val df = pts.toDF("id", "label", "codes").repartition(5)
      val got = ClusterEval.daviesBouldin(df, "id", "label", "codes")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got == want
    }

  property("nearestCentroidConfusion == brute-force argmin with " +
    "smaller-label ties") =
    forAll(genPts) { pts =>
      val cents: Map[Long, Seq[Long]] = pts.groupBy(_._2).map {
        case (l, ps) =>
          l -> (0 until Dim).map(d => ps.map(_._3(d)).sum / ps.size)
      }
      def d2(a: Seq[Long], b: Seq[Long]): Long =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val want = pts
        .map { case (_, l, v) =>
          (l, cents.toSeq.map { case (cl, c) => (d2(v, c), cl) }.min._2)
        }
        .groupBy(identity).map { case (k, g) => (k._1, k._2, g.size.toLong) }
        .toSeq.sortBy { case (l, a, _) => (l, a) }
      val df = pts.toDF("id", "label", "codes").repartition(5)
      val got = ClusterEval
        .nearestCentroidConfusion(df, "id", "label", "codes")
        .as[(Long, Long, Long)].collect().toSeq
      got == want
    }
}
