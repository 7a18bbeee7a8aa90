package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: [[Sampling.stratifiedFolds]] ≡ a sequential reference
  * (per-stratum (md5, id) rank mod k), plus the two defining laws —
  * EXACT balance (within every stratum, fold sizes differ by at most
  * one) and partitioning independence.
  */
object FoldsProps extends Properties("StratifiedFolds") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genIn: Gen[(List[(Long, String)], Int)] = for {
    n <- Gen.chooseNum(1, 40)
    nStrata <- Gen.chooseNum(1, 4)
    k <- Gen.chooseNum(1, 6)
    rows <- Gen.listOfN(n, Gen.chooseNum(0, nStrata - 1))
  } yield (rows.zipWithIndex.map { case (s, i) =>
    (i.toLong * 7 + 3, s"st$s") // non-contiguous ids
  }, k)

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def ref(rows: List[(Long, String)], k: Int)
      : Map[Long, Long] =
    rows.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy { case (id, _) => (md5hex(id.toString), id) }
        .zipWithIndex
        .map { case ((id, _), i) => id -> (i % k).toLong }
    }

  property("stratifiedFolds == sequential (md5, id) rank mod k; " +
    "folds exactly balanced per stratum") =
    forAll(genIn) { case (rows, k) =>
      val df = rows.toDF("id", "strata").repartition(5)
      val got = Sampling.stratifiedFolds(df, "id", "strata", k)
        .select($"id", $"fold").as[(Long, Long)].collect().toMap
      val balanced = rows.groupBy(_._2).forall { case (s, g) =>
        val sizes = g.map(r => got(r._1)).groupBy(identity)
          .values.map(_.size)
        sizes.max - sizes.min <= 1 &&
          got.filter(p => g.exists(_._1 == p._1)).values.toSet
            .subsetOf((0L until k.toLong).toSet)
      }
      got == ref(rows, k) && balanced
    }

  private val genNullIn: Gen[(List[(Long, Option[String])], Int)] = for {
    n <- Gen.chooseNum(1, 40)
    k <- Gen.chooseNum(1, 6)
    rows <- Gen.listOfN(n, Gen.chooseNum(0, 3))
  } yield (rows.zipWithIndex.map { case (s, i) =>
    (i.toLong * 7 + 3, if (s == 0) None else Some(s"st$s"))
  }, k)

  property("NULL is a legitimate stratum (r9 advisory): null-key " +
    "rows fold — never silently dropped — with the same exact " +
    "balance, via the null-safe offsets join") =
    forAll(genNullIn) { case (rows, k) =>
      val df = rows.toDF("id", "strata").repartition(5)
      val got = Sampling.stratifiedFolds(df, "id", "strata", k)
        .select($"id", $"fold").as[(Long, Long)].collect().toMap
      val expected = rows.groupBy(_._2).flatMap { case (_, g) =>
        g.sortBy { case (id, _) => (md5hex(id.toString), id) }
          .zipWithIndex
          .map { case ((id, _), i) => id -> (i % k).toLong }
      }
      got.size == rows.size && got == expected
    }
}
