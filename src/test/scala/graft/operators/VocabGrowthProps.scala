package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** ScalaCheck: the Heaps-curve operator ≡ a sequential prefix scan
  * (sort docs by id, accumulate tokens and the distinct-type set,
  * snapshot at each bucket's last doc), independent of partitioning —
  * plus the laws that make the first-occurrence reduction correct:
  * final cum_types = corpus distinct types, final cum_tokens = corpus
  * token count, both curves monotone, bucket sizes = the exact
  * (r−1)·B DIV n + 1 split.
  */
object VocabGrowthProps extends Properties("VocabGrowth") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def refCurve(docs: Seq[(Long, Seq[String])], buckets: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val sorted = docs.sortBy(_._1)
    val n = sorted.length
    val bucketOf = sorted.zipWithIndex.map { case ((id, _), i) =>
      id -> (i.toLong * buckets / n + 1) }.toMap
    val seen = scala.collection.mutable.Set.empty[String]
    var toks = 0L
    val snaps = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    var nDocsIn = 0L
    var lastBucket = 0L
    sorted.foreach { case (id, t) =>
      val b = bucketOf(id)
      if (b != lastBucket) { nDocsIn = 0; lastBucket = b }
      nDocsIn += 1
      toks += t.length
      t.foreach(seen += _)
      snaps(b) = (id, nDocsIn, toks, seen.size.toLong)
    }
    snaps.toSeq.sortBy(_._1).map { case (b, (cut, nd, ct, cy)) =>
      (b, cut, nd, ct, cy) }
  }

  private val corpusGen: Gen[(List[(Long, List[String])], Int)] = for {
    nDocs <- Gen.chooseNum(1, 25)
    docs <- Gen.listOfN(nDocs,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
        .map(_.take(12)))
    buckets <- Gen.chooseNum(1, 7)
  } yield (docs.zipWithIndex.map { case (t, i) => ((i * 3 + 1).toLong, t) },
    buckets)

  property("vocabGrowth == sequential prefix-scan reference") =
    forAll(corpusGen) { case (docs, buckets) =>
      val df = docs.map { case (i, t) => (i, t.mkString(" ")) }
        .toDF("doc_id", "text").repartition(3)
      val got = Profile.vocabGrowth(df, "doc_id", col("text"), buckets)
        .orderBy(col("bucket"))
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got == refCurve(docs, buckets)
    }

  property("final point = corpus totals; curves monotone") =
    forAll(corpusGen) { case (docs, buckets) =>
      val df = docs.map { case (i, t) => (i, t.mkString(" ")) }
        .toDF("doc_id", "text").repartition(2)
      val got = Profile.vocabGrowth(df, "doc_id", col("text"), buckets)
        .orderBy(col("bucket"))
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      val allToks = docs.flatMap(_._2)
      val last = got.last
      last._4 == allToks.length.toLong &&
        last._5 == allToks.distinct.length.toLong &&
        got.sliding(2).forall {
          case Seq(a, b) => a._4 <= b._4 && a._5 <= b._5
          case _ => true
        }
    }
}
