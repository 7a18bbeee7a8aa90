package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: [[Decontam.ngramAudit]] ≡ a sequential reference —
  * sliding n-gram sets, benchmark membership, longest consecutive
  * colliding run — on random tiny corpora over a 3-word alphabet
  * (maximal collision density: repeated grams within one doc, grams
  * shared across benchmark docs, runs that touch both ends), any
  * partitioning.
  */
object DecontamProps extends Properties("Decontam") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  private val N = 3

  private val genDoc: Gen[String] = for {
    len <- Gen.chooseNum(0, 12) // includes docs shorter than n
    ws <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc"))
  } yield ws.mkString(" ")

  private val genIn: Gen[(List[(Long, String)], List[(Long, String)])] =
    for {
      nc <- Gen.chooseNum(1, 10)
      nb <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(nc, genDoc)
      bs <- Gen.listOfN(nb, genDoc)
    } yield (
      cs.zipWithIndex.map { case (t, i) => (i.toLong * 3 + 1, t) },
      bs.zipWithIndex.map { case (t, i) => (i.toLong + 1000, t) })

  private def grams(text: String): Seq[String] = {
    val toks = text.toLowerCase.split("\\s+").toSeq
    if (toks.size < N || text.isEmpty) Seq.empty
    else (0 to toks.size - N).map(i => toks.slice(i, i + N).mkString(" "))
  }

  private def ref(corpus: List[(Long, String)],
      bench: List[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val bg = bench.flatMap { case (_, t) => grams(t) }.toSet
    corpus.flatMap { case (id, t) =>
      val gs = grams(t)
      if (gs.isEmpty) None
      else {
        val hits = gs.map(bg.contains)
        var longest = 0L
        var cur = 0L
        hits.foreach { h =>
          cur = if (h) cur + 1 else 0
          longest = math.max(longest, cur)
        }
        Some(id -> ((gs.size.toLong, hits.count(identity).toLong,
          longest)))
      }
    }.toMap
  }

  property("ngramAudit == sequential sliding-gram reference " +
    "(census + longest run), any partitioning; short docs absent") =
    forAll(genIn) { case (corpus, bench) =>
      val cdf = corpus.toDF("doc_id", "text").repartition(4)
      val bdf = bench.toDF("doc_id", "text").repartition(2)
      val got = Decontam.ngramAudit(cdf, bdf, "doc_id", "text", N)
        .as[(Long, Long, Long, Long)].collect()
        .map { case (id, g, h, r) => id -> ((g, h, r)) }.toMap
      got == ref(corpus, bench)
    }
}
