package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the integer-bit Stupid-Backoff scorer ≡ a sequential
  * driver reference — train (count, prune with the (count desc, word)
  * tie-break, constants) and score (seen / backoff / OOV arms) — on
  * random corpora with forced pruning, independent of partitioning.
  */
object LangModelProps extends Properties("LangModel") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def flog2(x: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(x)

  private val corpusGen: Gen[(List[List[String]], Int, Int)] = for {
    nDocs <- Gen.chooseNum(1, 10)
    docs <- Gen.listOfN(nDocs,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e"))
        .map(_.take(8)))
    biK <- Gen.chooseNum(1, 12) // binds often: ≤ 25 bigram types
    uniK <- Gen.chooseNum(1, 5)
  } yield (docs, biK, uniK)

  private def refModel(train: Seq[Seq[String]], biK: Int, uniK: Int) = {
    val uni0 = train.flatten.groupBy(identity)
      .map { case (w, l) => w -> l.size.toLong }
    val uni = uni0.toSeq.sortBy { case (w, c) => (-c, w) }.take(uniK)
    val bi = train.filter(_.size >= 2)
      .flatMap(t => t.init.zip(t.tail))
      .groupBy(identity).map { case (p, l) => p -> l.size.toLong }
      .toSeq.sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(biK)
      .map { case (p, c12) => p -> (c12, uni0(p._1)) }.toMap
    (bi, uni.toMap, uni.map(_._2).sum, uni.size.toLong)
  }

  private def refScore(doc: Seq[String],
      bi: Map[(String, String), (Long, Long)], uni: Map[String, Long],
      n: Long, v: Long): (Long, Long) = {
    val bits = doc.init.zip(doc.tail).map { case (w1, w2) =>
      bi.get((w1, w2)) match {
        case Some((c12, c1)) => flog2(c1) - flog2(c12)
        case None => 1L + flog2(n + v) - flog2(uni.getOrElse(w2, 0L) + 1L)
      }
    }
    (bits.sum, bits.size.toLong)
  }

  property("trainBigram + scoreBits == sequential reference") =
    forAll(corpusGen) { case (docs, biK, uniK) =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, i % 2 == 0, ws.mkString(" ")) }
        .toDF("doc_id", "is_train", "text").repartition(4)
      val train = docs.zipWithIndex.collect {
        case (ws, i) if i % 2 == 0 => ws
      }
      if (train.flatten.isEmpty) true
      else {
        val lm = LangModel.trainBigram(
          df.filter($"is_train"), $"text", biK = biK, uniK = uniK)
        val got = LangModel
          .scoreBits(df, Seq("doc_id"), $"text", lm)
          .as[(Long, Long, Long)].collect()
          .map { case (id, b, n) => id -> ((b, n)) }.toMap
        val (bi, uni, n, v) = refModel(train, biK, uniK)
        val want = docs.zipWithIndex.collect {
          case (ws, i) if ws.size >= 2 =>
            i.toLong -> refScore(ws, bi, uni, n, v)
        }.toMap
        got == want
      }
    }

  property("flog2 column == 63 - numberOfLeadingZeros") =
    forAll(Gen.chooseNum(1L, Long.MaxValue)) { x =>
      val got = Seq(x).toDF("c")
        .select(LangModel.flog2(col("c"))).as[Long].head()
      got == flog2(x)
    }

  property("contrastBits == refScore(source) - refScore(target)") =
    forAll(corpusGen) { case (docs, biK, uniK) =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, i % 2 == 0, ws.mkString(" ")) }
        .toDF("doc_id", "is_train", "text").repartition(4)
      val targetDocs = docs.zipWithIndex.collect {
        case (ws, i) if i % 2 == 0 => ws
      }
      if (targetDocs.flatten.isEmpty) true
      else {
        val target = LangModel.trainBigram(
          df.filter($"is_train"), $"text", biK = biK, uniK = uniK)
        val source = LangModel.trainBigram(df, $"text",
          biK = biK, uniK = uniK)
        val got = LangModel
          .contrastBits(df, Seq("doc_id"), $"text", target, source)
          .select($"doc_id", $"t_bits", $"s_bits", $"w_bits")
          .as[(Long, Long, Long, Long)].collect()
          .map { case (id, t, s, w) => id -> ((t, s, w)) }.toMap
        val (tBi, tUni, tN, tV) = refModel(targetDocs, biK, uniK)
        val (sBi, sUni, sN, sV) = refModel(docs, biK, uniK)
        val want = docs.zipWithIndex.collect {
          case (ws, i) if ws.size >= 2 =>
            val t = refScore(ws, tBi, tUni, tN, tV)._1
            val s = refScore(ws, sBi, sUni, sN, sV)._1
            i.toLong -> ((t, s, s - t))
        }.toMap
        got == want
      }
    }
}
