package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the hash-drawn Poisson weights match a reference
  * md5-hex threshold fold, weights average ≈ 1 over many draws (the
  * resampling is honest), and meanCi equals a sequential reference —
  * same weights, same single-division means, same order statistics —
  * under any partitioning.
  */
object BootstrapProps extends Properties("Bootstrap") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def refWeight(id: String, rep: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$rep".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val u = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    Bootstrap.PoissonThresholds.count(u >= _).toLong
  }

  property("replicated weights == md5-threshold reference fold") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 500L)).map(_.distinct),
        Gen.chooseNum(1, 6)) { (ids, reps) =>
      val got = Bootstrap
        .replicated(ids.toDF("id").repartition(4), "id", reps)
        .select($"id", $"rep", $"wgt").as[(Long, Int, Long)]
        .collect().toSet
      val want = (for (id <- ids; r <- 0 until reps)
        yield (id, r, refWeight(id.toString, r))).toSet
      got == want
    }

  property("meanCi == sequential reference (weights, divisions, " +
      "order statistics)") =
    // ≥15 docs so P(a replicate draws all-zero weights) ≈ e^-15 —
    // a 0/0 NaN there would flake the exact compare
    forAll(Gen.listOfN(40,
        Gen.zip(Gen.chooseNum(0L, 400L), Gen.chooseNum(1L, 99L)))
        .map(_.distinctBy(_._1).take(30)).suchThat(_.size >= 15),
        Gen.chooseNum(4, 10)) { (rows, reps) =>
      val df = rows.toDF("id", "v").repartition(4)
      val got = Bootstrap
        .meanCi(df, "id", "v", reps, loRank = 1, hiRank = reps)
        .as[(Long, Double, Double, Double)].head()
      val means = (0 until reps).map { r =>
        val ws = rows.map { case (id, v) =>
          (refWeight(id.toString, r), v)
        }
        val num = ws.map { case (w, v) => w * v }.sum
        val den = ws.map(_._1).sum
        num.toDouble / den.toDouble
      }.sorted
      val n = rows.size.toLong
      val mean = rows.map(_._2).sum.toDouble / n
      got == ((n, mean, means.head, means.last))
    }

  property("weights average to ~1 over many draws") =
    forAll(Gen.chooseNum(0, 3)) { rep =>
      val ids = (0L until 2000L).toList
      val avg = ids.map(id => refWeight(id.toString, rep)).sum /
        2000.0
      math.abs(avg - 1.0) < 0.08
    }
}
