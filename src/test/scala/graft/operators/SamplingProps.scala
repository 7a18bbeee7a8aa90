package graft.operators

import java.security.MessageDigest

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: Hamilton apportionment hands out exactly the budget
  * with every stratum within one seat of its real quota, and the
  * md5-ordered take equals a sequential reference selection no matter
  * how the input is partitioned.
  */
object SamplingProps extends Properties("Sampling") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val strataGen: Gen[(List[Long], Long)] = for {
    masses <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L))
      .suchThat(_.sum > 0)
    budget <- Gen.chooseNum(0L, 60L)
  } yield (masses, budget)

  property("Σ n_alloc == budget and |n_alloc - S·m/N| < 1") =
    forAll(strataGen) { case (masses, budget) =>
      val counts = masses.zipWithIndex
        .map { case (m, i) => (f"s$i%02d", m) }.toDF("stratum", "mass")
      val alloc = Sampling
        .allocateLargestRemainder(counts, Seq("stratum"), "mass", budget)
        .as[(String, Long, Long)].collect()
        .map { case (s, _, a) => s -> a }.toMap
      val tot = masses.sum
      val sums = alloc.values.sum == budget
      val quotas = masses.zipWithIndex.forall { case (m, i) =>
        val exact = BigDecimal(budget) * m / tot
        (BigDecimal(alloc(f"s$i%02d")) - exact).abs < 1
      }
      sums && quotas
    }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private val takeGen: Gen[(List[(String, Long)], Long)] = for {
    nStrata <- Gen.chooseNum(1, 4)
    rows <- Gen.nonEmptyListOf(for {
      s <- Gen.chooseNum(0, nStrata - 1)
      id <- Gen.chooseNum(0L, 500L)
    } yield (s"s$s", id))
    budget <- Gen.chooseNum(0L, 30L)
  } yield (rows.distinct, budget)

  property("takeStratified == sequential md5-order reference, " +
      "independent of partitioning") =
    forAll(takeGen) { case (rows, budget) =>
      val df = rows.toDF("stratum", "id").repartition(5)
      val counts = rows.groupBy(_._1).map { case (s, l) =>
        (s, l.size.toLong)
      }.toList.toDF("stratum", "mass")
      val alloc = Sampling
        .allocateLargestRemainder(counts, Seq("stratum"), "mass", budget)
      val allocMap = alloc.as[(String, Long, Long)].collect()
        .map { case (s, _, a) => s -> a }.toMap
      val got = Sampling
        .takeStratified(df, Seq("stratum"), "id", alloc)
        .as[(String, Long)].collect().toSet
      // .toList before flatMap: flatMapping a Map with tuple results
      // would collapse same-stratum picks into one entry
      val want = rows.groupBy(_._1).toList.flatMap { case (s, l) =>
        l.map(_._2).sortBy(id => (md5Hex(id.toString), id))
          .take(allocMap(s).toInt).map(s -> _)
      }.toSet
      got == want
    }

  private val ppsGen: Gen[(List[(Long, Long)], Long)] = for {
    n <- Gen.chooseNum(1, 40)
    ids <- Gen.pick(n, 0L until 300L)
    ws <- Gen.listOfN(n, Gen.chooseNum(0L, 40L))
    s <- Gen.chooseNum(0L, 50L)
  } yield (ids.toList.zip(ws), s)

  property("systematicPps: Σ picks == S, each within 1 of S·w/W, " +
      "== sequential tick reference") =
    forAll(ppsGen) { case (rows, s) =>
      val tot = rows.map(_._2).sum
      val df = rows.toDF("id", "w").repartition(5)
      val got = Sampling.systematicPps(df, "id", "w", s)
        .select("id", "n_picks").as[(Long, Long)].collect().toMap
      if (tot == 0) got.isEmpty
      else {
        val ordered = rows.sortBy { case (id, _) =>
          (md5Hex(id.toString), id)
        }
        val cums = ordered.map(_._2).scanLeft(0L)(_ + _).init
        def ceilDiv(a: Long, b: Long) = (a + b - 1) / b
        val want = ordered.zip(cums).map { case ((id, w), c) =>
          id -> (ceilDiv((c + w) * s, tot) - ceilDiv(c * s, tot))
        }.filter(_._2 > 0).toMap
        val exact = got == want
        val total = got.values.sum == s
        val within = ordered.forall { case (id, w) =>
          val quota = BigDecimal(s) * w / tot
          (BigDecimal(got.getOrElse(id, 0L)) - quota).abs <= 1
        }
        exact && total && within
      }
    }
}
