package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck invariants for [[Dedup.chunkDedup]] against an
  * in-memory brute-force reference: on ANY corpus over a small shared
  * vocabulary (so cross-document chunk collisions actually occur),
  * the kept flags must equal "first occurrence of this chunk content
  * in (doc_id, chunk_idx) order", and occurrence accounting must be
  * exact — every full chunk classified, tails ignored.
  */
object DedupProps extends Properties("Dedup.chunkDedup") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val C = 5 // chunk size under test

  // tiny vocabulary → dense chunk collisions; doc length includes
  // sub-chunk docs (0..C-1 tokens → zero full chunks) and tails
  private val corpusGen: Gen[List[String]] =
    Gen.listOfN(8,
      Gen.choose(0, 4 * C - 1).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
          .map(_.mkString(" "))))

  private def brute(docs: Seq[(Long, String)])
      : Set[(Long, Int, Boolean)] = {
    val occ = for {
      (id, text) <- docs
      toks = text.split("\\s+").filter(_.nonEmpty)
      (chunk, i) <- toks.grouped(C).zipWithIndex.toSeq
      if chunk.length == C
    } yield (id, i, chunk.mkString(" "))
    val firstOf = occ.groupBy(_._3).view
      .mapValues(_.minBy(o => (o._1, o._2))).toMap
    occ.map(o => (o._1, o._2, firstOf(o._3) == o)).toSet
  }

  property("kept ≡ brute-force first occurrence; tails ignored") =
    forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
        .filter(_._2.nonEmpty)
      docs.isEmpty || {
        val got = Dedup
          .chunkDedup(docs.toDF("doc_id", "text"), "text", "doc_id",
            chunkTokens = C)
          .select("doc_id", "chunk_idx", "kept")
          .as[(Long, Int, Boolean)].collect().toSet
        got == brute(docs)
      }
    }
}
