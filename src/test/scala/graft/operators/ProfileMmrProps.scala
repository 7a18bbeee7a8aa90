package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the concentration profile (PrefixSum-ranked Gini, HHI,
  * floor-bit entropy) and vocab stats equal sequential references on
  * random corpora, any partitioning; degenerate distributions pin the
  * closed-form extremes.
  */
object ProfileProps extends Properties("Profile") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private def flog2(v: Long): Long =
    63 - java.lang.Long.numberOfLeadingZeros(v)

  private val keysGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("s0", "s1", "s2", "s3", "s4", "s5"))

  property("concentration == sequential sorted-rank reference") =
    forAll(keysGen) { keys =>
      val got = Profile.concentration(
          keys.map(Tuple1(_)).toDF("k").repartition(4), "k")
        .as[(Long, Long, Long, Long, Long, Long, Long)].head()
      val counts = keys.groupBy(identity).toSeq
        .map { case (k, l) => (l.size.toLong, k) }
        .sortBy { case (c, k) => (c, k) }
      val n = BigInt(keys.size)
      val g = BigInt(counts.size)
      val c2 = counts.map { case (c, _) => BigInt(c) * c }.sum
      val ric = counts.zipWithIndex
        .map { case ((c, _), i) => BigInt(i + 1) * c }.sum
      val cf = counts.map { case (c, _) => BigInt(c) * flog2(c) }.sum
      val want = (n.toLong, g.toLong,
        (100000000 * c2 / (n * n)).toLong,
        (2 * ric - (g + 1) * n).toLong,
        (g * n).toLong,
        (10000 * (2 * ric - (g + 1) * n) / (g * n)).toLong,
        (1000 * (n * flog2(keys.size.toLong) - cf) / n).toLong)
      got == want
    }

  property("single group: gini 0, hhi 10^8; all-singletons: gini 0") = {
    val one = Profile.concentration(
        List.fill(9)("a").map(Tuple1(_)).toDF("k"), "k")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val singles = Profile.concentration(
        (0 until 8).map(i => Tuple1(s"k$i")).toDF("k"), "k")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    one._3 == 100000000L && one._4 == 0L && one._6 == 0L &&
      singles._4 == 0L && singles._6 == 0L &&
      singles._7 == 3000L // uniform over 8: exactly log2(8) bits
  }

  private val textsGen: Gen[List[String]] = Gen.nonEmptyListOf(
    Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
      .map(_.mkString(" ")))

  property("vocabStats == sequential fold (top-k cut binding)") =
    forAll(textsGen) { texts =>
      val topK = 2 // < 5 distinct words: the cut can bind
      val got = Profile.vocabStats(
          texts.map(Tuple1(_)).toDF("text").repartition(3),
          org.apache.spark.sql.functions.col("text"), topK)
        .as[(Long, Long, Long, Long, Long, Long)].head()
      val wc = texts.flatMap(_.split("\\s+").toList)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = wc.values.sum
      val t = wc.size.toLong
      val h = wc.values.count(_ == 1L).toLong
      val topc = wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(topK)
        .map(_._2).sum
      got == (n, t, h, 10000 * t / n, 10000 * h / t, 10000 * topc / n)
    }
}

/** ScalaCheck: the unrolled distributed MMR greedy equals a
  * sequential per-query greedy reference — same λ = 1/2 score, same
  * (score desc, cid) tie-break, missing sims read as 0 — and short
  * candidate lists exhaust gracefully.
  */
object MmrProps extends Properties("Mmr") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val caseGen: Gen[(List[(Long, Long, Long)],
      List[(Long, Long, Long, Long)], Int)] = for {
    nQ <- Gen.chooseNum(1, 3)
    k <- Gen.chooseNum(1, 4)
    cands <- Gen.sequence[List[List[(Long, Long, Long)]],
        List[(Long, Long, Long)]]((0 until nQ).toList.map { q =>
      Gen.chooseNum(1, 6).flatMap(nc =>
        Gen.listOfN(nc, Gen.chooseNum(0L, 50L)).map(_.zipWithIndex.map {
          case (rel, i) => (q.toLong, i.toLong, rel)
        }))
    }).map(_.flatten)
    simSeed <- Gen.chooseNum(0L, 1000L)
  } yield {
    // deterministic symmetric sims from a seed (no Gen-per-pair blowup)
    val sims = for {
      (q, a, _) <- cands
      (q2, b, _) <- cands
      if q2 == q && a != b
    } yield (q, a, b, (simSeed + 7 * q + 3 * (a min b) + 5 * (a max b)) % 40)
    (cands, sims, k)
  }

  private def reference(cands: List[(Long, Long, Long)],
      sims: List[(Long, Long, Long, Long)], k: Int)
      : Set[(Long, Int, Long, Long)] = {
    val simMap = sims.map { case (q, a, b, s) => (q, a, b) -> s }.toMap
    cands.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      var rem = cs.map { case (_, cid, rel) => (cid, rel, 0L) }
      var out = List.empty[(Long, Int, Long, Long)]
      var step = 1
      while (step <= k && rem.nonEmpty) {
        val (cid, rel, ms) = rem
          .minBy { case (c, r, m) => (-(r - m), c) }
        out ::= ((q, step, cid, rel - ms))
        rem = rem.filter(_._1 != cid).map { case (c, r, m) =>
          (c, r, m max simMap.getOrElse((q, c, cid), 0L))
        }
        step += 1
      }
      out
    }.toSet
  }

  property("diversifyTopK == sequential greedy reference") =
    forAll(caseGen) { case (cands, sims, k) =>
      val got = Mmr.diversifyTopK(
          cands.toDF("qid", "cid", "rel").repartition(3),
          sims.toDF("qid", "a", "b", "sim").repartition(3), k)
        .as[(Long, Int, Long, Long)].collect().toSet
      got == reference(cands, sims, k)
    }

  property("step 1 is the pure relevance argmax") =
    forAll(caseGen) { case (cands, sims, _) =>
      val got = Mmr.diversifyTopK(
          cands.toDF("qid", "cid", "rel"),
          sims.toDF("qid", "a", "b", "sim"), 1)
        .as[(Long, Int, Long, Long)].collect().toSet
      val want = cands.groupBy(_._1).map { case (q, cs) =>
        val (_, cid, rel) = cs.minBy { case (_, c, r) => (-r, c) }
        (q, 1, cid, rel)
      }.toSet
      got == want
    }
}
