package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: rankMetrics matches a direct per-query Scala fold over
  * the same integer weight tables (any partitioning), the quantized
  * nDCG tracks the real-valued nDCG within quantization error, and
  * rrfFuse reproduces the brute-force fused ordering with its
  * documented tie-breaks.
  */
object RetrievalEvalProps extends Properties("RetrievalEval") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val K = 5
  private val W = RetrievalEval.ndcgWeightsMicro(K)
  private val P = RetrievalEval.idcgPrefixMicro(K)

  // per query: ranked rel flags (list length = run depth) and how many
  // relevant exist corpus-wide beyond the retrieved ones
  private val runsGen: Gen[List[(Long, List[Boolean], Int)]] =
    Gen.nonEmptyListOf(for {
      qid <- Gen.chooseNum(0L, 6L)
      rels <- Gen.listOfN(K + 2, Gen.oneOf(true, false))
      depth <- Gen.chooseNum(0, K + 2)
      extra <- Gen.chooseNum(0, 4)
    } yield (qid, rels.take(depth), extra))
      .map(_.distinctBy(_._1))

  property("rankMetrics == direct per-query fold on the same " +
      "integer weights") =
    forAll(runsGen) { runs =>
      val ranked = runs.flatMap { case (qid, rels, _) =>
        rels.zipWithIndex.map { case (r, i) =>
          (qid, (i + 1).toLong, if (r) 1L else 0L)
        }
      }
      val nRel = runs.map { case (qid, rels, extra) =>
        (qid, (rels.count(identity) + extra).toLong)
      }
      val rankedDf =
        if (ranked.isEmpty)
          Seq.empty[(Long, Long, Long)].toDF("qid", "rank", "rel")
        else ranked.toDF("qid", "rank", "rel").repartition(5)
      val got = RetrievalEval
        .rankMetrics(rankedDf, nRel.toDF("qid", "n_rel"), K)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1)
      val want = runs.map { case (qid, rels, extra) =>
        val top = rels.take(K)
        val nr = rels.count(identity).toLong + extra
        val hits = top.count(identity).toLong
        val dcg = top.zipWithIndex
          .collect { case (true, i) => W(i) }.sum
        val idcg = if (nr <= 0) 0L else P(math.min(nr, K).toInt - 1)
        val ndcg = if (idcg <= 0) 0L else 10000L * dcg / idcg
        val fr = top.indexOf(true)
        val mrr = if (fr < 0) 0L else 1000000L / (fr + 1)
        val recall = if (nr <= 0) 0L else 10000L * hits / nr
        (qid, nr, hits, dcg, idcg, ndcg, mrr, recall)
      }.sortBy(_._1)
      got.toList == want
    }

  property("quantized ndcg_bp within 2e-4 of real-valued nDCG") =
    forAll(runsGen) { runs =>
      runs.forall { case (_, rels, extra) =>
        val top = rels.take(K)
        val nr = rels.count(identity) + extra
        if (nr == 0) true
        else {
          def disc(i: Int) = 1.0 / (math.log(i + 2.0) / math.log(2.0))
          val dcg = top.zipWithIndex
            .collect { case (true, i) => disc(i) }.sum
          val idcg = (0 until math.min(nr, K)).map(disc).sum
          val real = dcg / idcg
          val dcgQ = top.zipWithIndex
            .collect { case (true, i) => W(i) }.sum
          val idcgQ = P(math.min(nr, K) - 1)
          val quant = 10000L * dcgQ / idcgQ / 10000.0
          math.abs(quant - real) <= 2e-4
        }
      }
    }

  private val fuseGen: Gen[(List[(Long, Long, Long)],
      List[(Long, Long, Long)])] = {
    val rankingGen = Gen.listOf(for {
      qid <- Gen.chooseNum(0L, 3L)
      cids <- Gen.someOf(0L to 9L)
    } yield cids.toList.sorted.zipWithIndex.map { case (c, i) =>
      (qid, c, (i + 1).toLong)
    }).map(_.flatten.distinctBy(t => (t._1, t._2)))
    for { a <- rankingGen; b <- rankingGen } yield (a, b)
  }

  property("rrfFuse == brute-force integer RRF with " +
      "(score, n_lists, cid) ordering") =
    forAll(fuseGen) { case (a, b) =>
      def df(r: List[(Long, Long, Long)]) =
        if (r.isEmpty)
          Seq.empty[(Long, Long, Long)].toDF("qid", "cid", "rank")
        else r.toDF("qid", "cid", "rank").repartition(3)
      val got = RetrievalEval.rrfFuse(Seq(df(a), df(b)), 60, 4)
        .as[(Long, Int, Long, Long, Long)].collect()
        .sortBy(t => (t._1, t._2)).toList
      val contribs = (a ++ b).map { case (q, c, r) =>
        ((q, c), 1000000000L / (60 + r))
      }
      val want = contribs.groupBy(_._1).toList.map { case ((q, c), l) =>
        (q, c, l.map(_._2).sum, l.size.toLong)
      }.groupBy(_._1).toList.flatMap { case (q, cands) =>
        cands.sortBy { case (_, c, s, nl) => (-s, -nl, c) }
          .take(4).zipWithIndex
          .map { case ((_, c, s, nl), i) => (q, i + 1, c, s, nl) }
      }.sortBy(t => (t._1, t._2))
      got == want
    }
}
