package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: majority-vote consensus and rater reliability equal a
  * direct sequential fold — any rater count, abstentions (nulls),
  * ties, any partitioning.
  */
object MajorityVoteProps extends Properties("MajorityVote") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val ratingsGen: Gen[(Int, List[List[Option[String]]])] = for {
    nRaters <- Gen.chooseNum(1, 5)
    items <- Gen.nonEmptyListOf(Gen.listOfN(nRaters,
      Gen.frequency(3 -> Gen.oneOf("a", "b", "c").map(Option(_)),
        1 -> Gen.const(Option.empty[String]))))
  } yield (nRaters, items)

  private def toDf(nRaters: Int, items: List[List[Option[String]]]) =
    items.zipWithIndex
      .map { case (rs, i) => (i.toLong, rs.map(_.orNull)) }
      .toDF("item", "rs")
      .selectExpr(Seq("item") ++
        (0 until nRaters).map(j => s"rs[$j] AS r$j"): _*)
      .repartition(5)

  /** winner + runner-up per the operator's (count desc, cat asc)
    * order; None when the item has zero votes.
    */
  private def refConsensus(items: List[List[Option[String]]])
      : Map[Long, (String, Long, Long, Long)] =
    items.zipWithIndex.flatMap { case (rs, i) =>
      val votes = rs.flatten
      if (votes.isEmpty) None
      else {
        val counts = votes.groupBy(identity).view
          .mapValues(_.size.toLong).toSeq
          .sortBy { case (cat, c) => (-c, cat) }
        val (cat, top) = counts.head
        val runner = counts.drop(1).headOption.map(_._2).getOrElse(0L)
        Some(i.toLong -> (cat, top, votes.size.toLong, top - runner))
      }
    }.toMap

  property("consensus/n_votes/n_ratings/margin == sequential fold") =
    forAll(ratingsGen) { case (nRaters, items) =>
      val got = Association
        .majorityVote(toDf(nRaters, items), "item",
          (0 until nRaters).map(j => s"r$j"))
        .as[(Long, String, Long, Long, Long)].collect()
        .map { case (i, c, v, n, m) => i -> (c, v, n, m) }.toMap
      got == refConsensus(items)
    }

  property("reliability == per-rater agree fold vs that consensus") =
    forAll(ratingsGen) { case (nRaters, items) =>
      val cons = refConsensus(items)
      val want = (0 until nRaters).flatMap { j =>
        val rated = items.zipWithIndex
          .collect { case (rs, i) if rs(j).isDefined =>
            (i.toLong, rs(j).get) }
        if (rated.isEmpty) None
        else {
          val agree = rated.count { case (i, c) => cons(i)._1 == c }
          Some(s"r$j" ->
            (rated.size.toLong, agree.toLong,
              10000L * agree / rated.size))
        }
      }.toMap
      val got = Association
        .raterReliability(toDf(nRaters, items), "item",
          (0 until nRaters).map(j => s"r$j"))
        .as[(String, Long, Long, Long)].collect()
        .map { case (r, n, a, bp) => r -> (n, a, bp) }.toMap
      got == want
    }

  property("unanimous panel: margin == n_votes == n_ratings") = {
    val df = (0L until 5L).map(i => (i, "x", "x", "x"))
      .toDF("item", "r1", "r2", "r3")
    Association.majorityVote(df, "item", Seq("r1", "r2", "r3"))
      .as[(Long, String, Long, Long, Long)].collect()
      .forall { case (_, c, v, n, m) =>
        c == "x" && v == 3L && n == 3L && m == 3L }
  }

  property("1-1 tie breaks to the lexicographically smaller cat, " +
      "margin 0") = {
    val df = Seq((0L, "b", "a")).toDF("item", "r1", "r2")
    val (_, c, v, n, m) = Association
      .majorityVote(df, "item", Seq("r1", "r2"))
      .as[(Long, String, Long, Long, Long)].head()
    c == "a" && v == 1L && n == 2L && m == 0L
  }
}

/** ScalaCheck: the distributed doubled-median / MAD gate equals the
  * sorted-sequence definition — any value distribution (ties, skew,
  * negatives), any k, any partitioning; and the PrefixSum-based
  * median selection never sees a partition-less window.
  */
object RobustProps extends Properties("Robust") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val valuesGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.frequency(
      5 -> Gen.chooseNum(-20L, 20L),
      1 -> Gen.chooseNum(-100000L, 100000L)))

  private def refMed2(vs: Seq[Long]): Long = {
    val s = vs.sorted
    s((s.size - 1) / 2) + s(s.size / 2)
  }

  property("med2/mad4/dev2/flag == sorted-sequence definition") =
    forAll(valuesGen, Gen.chooseNum(0L, 6L)) { (vs, kNum) =>
      val med2 = refMed2(vs)
      val devs = vs.map(v => math.abs(2 * v - med2))
      val mad4 = refMed2(devs)
      val want = vs.zipWithIndex.map { case (v, i) =>
        val d = math.abs(2 * v - med2)
        (i.toLong, v, med2, mad4, d,
          if (2 * d > kNum * mad4) 1L else 0L)
      }.toSet
      val got = Robust
        .madGate(vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v").repartition(7), "v", kNum)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      got == want
    }

  property("odd n: med2 == 2 * middle element; all-equal input " +
      "flags nothing") = {
    val (_, _, med2a, _, _, _) = Robust
      .madGate(Seq((0L, 1L), (1L, 5L), (2L, 9L)).toDF("id", "v"),
        "v", 3L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val eq = Robust
      .madGate((0L until 6L).map((_, 7L)).toDF("id", "v"), "v", 0L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    med2a == 10L &&
      eq.forall { case (_, _, m2, m4, d2, f) =>
        m2 == 14L && m4 == 0L && d2 == 0L && f == 0L }
  }

  property("rational k: kNum/kDen gate == scaled integer comparison") =
    forAll(valuesGen) { vs =>
      val med2 = refMed2(vs)
      val mad4 = refMed2(vs.map(v => math.abs(2 * v - med2)))
      val got = Robust
        .madGate(vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v"), "v", kNum = 5L, kDen = 2L)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      got.forall { case (_, v, _, _, d, f) =>
        f == (if (4 * math.abs(2 * v - med2) > 5 * mad4) 1L else 0L) &&
          d == math.abs(2 * v - med2)
      }
    }
}

/** ScalaCheck: vocabulary drift equals a direct BigInt fold over the
  * two token-count maps — any corpora (including one side empty of
  * overlap), any partitioning.
  */
object VocabDriftProps extends Properties("VocabDrift") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val docGen: Gen[String] = Gen.nonEmptyListOf(
    Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] = Gen.nonEmptyListOf(docGen)

  private def counts(docs: List[String]): Map[String, Long] =
    docs.flatMap(_.toLowerCase.split("\\s+", -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def reference(oldDocs: List[String], newDocs: List[String])
      : (Long, Long, Long, Long, Long, Long, Long, Long) = {
    val (c1, c2) = (counts(oldDocs), counts(newDocs))
    val n1 = BigInt(c1.values.sum)
    val n2 = BigInt(c2.values.sum)
    val oov = BigInt(c2.view.filterKeys(w => !c1.contains(w)).values.sum)
    val sd = (c1.keySet ++ c2.keySet).toSeq.map { w =>
      (BigInt(c1.getOrElse(w, 0L)) * n2
        - BigInt(c2.getOrElse(w, 0L)) * n1).abs
    }.sum
    (n1.toLong, n2.toLong, c1.size.toLong, c2.size.toLong,
      (c2.keySet -- c1.keySet).size.toLong,
      (c1.keySet -- c2.keySet).size.toLong,
      if (n2 == 0) 0L else (10000 * oov / n2).toLong,
      if (n1 == 0 || n2 == 0) 0L
      else (10000 * sd / (2 * n1 * n2)).toLong)
  }

  private def run(oldDocs: List[String], newDocs: List[String]) =
    Profile.vocabDrift(
        oldDocs.toDF("text").repartition(3),
        newDocs.toDF("text").repartition(4),
        org.apache.spark.sql.functions.col("text"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()

  property("all eight outputs == direct BigInt fold") =
    forAll(corpusGen, corpusGen) { (o, n) => run(o, n) == reference(o, n) }

  property("identical corpora: tvd == 0, oov == 0, no type churn") =
    forAll(corpusGen) { docs =>
      val (_, _, t1, t2, nt, lt, oov, tvd) = run(docs, docs)
      t1 == t2 && nt == 0L && lt == 0L && oov == 0L && tvd == 0L
    }

  property("disjoint vocabularies: oov == tvd == 10000") = {
    val (_, _, _, _, nt, lt, oov, tvd) =
      run(List("aa aa bb"), List("cc dd"))
    nt == 2L && lt == 2L && oov == 10000L && tvd == 10000L
  }
}
