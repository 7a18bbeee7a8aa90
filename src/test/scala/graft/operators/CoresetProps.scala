package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: [[Coreset.kCenterGreedy]] ≡ the sequential greedy
  * farthest-point reference — seed = smallest id, argmax of
  * min-distance-to-selected with ties to the smaller id, selected ids
  * excluded — independent of partitioning, including duplicate
  * vectors (radius hits 0) and n < k (fewer rows out).
  */
object CoresetProps extends Properties("Coreset") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val Dim = 4

  private val genPts: Gen[(List[(Long, Seq[Long])], Int)] = for {
    n <- Gen.chooseNum(1, 20)
    k <- Gen.chooseNum(1, 8)
    vs <- Gen.listOfN(n, Gen.listOfN(Dim, Gen.chooseNum(0L, 9L)))
  } yield (vs.zipWithIndex.map { case (v, i) =>
    (i.toLong * 3 + 1, v: Seq[Long]) // non-contiguous ids
  }, k)

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def ref(pts: List[(Long, Seq[Long])], k: Int)
      : Seq[(Int, Long, Long)] = {
    val seed = pts.minBy(_._1)
    var picked = Vector((1, seed._1, 0L, seed._2))
    while (picked.size < k &&
        pts.exists(p => !picked.exists(_._2 == p._1))) {
      val cand = pts.filter(p => !picked.exists(_._2 == p._1))
        .map { case (id, v) =>
          (id, picked.map(s => d2(v, s._4)).min, v)
        }
      val (id, md, v) = cand.maxBy { case (id, md, _) => (md, -id) }
      picked :+= ((picked.size + 1, id, md, v))
    }
    picked.map { case (s, i, d, _) => (s, i, d) }
  }

  property("kCenterGreedy == sequential farthest-point reference") =
    forAll(genPts) { case (pts, k) =>
      val df = pts.toDF("vec_id", "codes").repartition(5)
      val got = Coreset.kCenterGreedy(df, "vec_id", "codes", k)
        .orderBy("step").as[(Int, Long, Long)].collect().toSeq
      got == ref(pts, k)
    }
}
