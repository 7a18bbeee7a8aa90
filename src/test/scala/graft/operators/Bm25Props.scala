package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the integer-exact BM25 scorer ≡ a sequential BigInt
  * driver reference — floor-bit IDF (clamped at 0), the 10·T-cleared
  * saturation rational, quantize-then-sum at milli precision, and the
  * (score desc, doc asc) top-k tie-break — on random corpora and
  * query sets, independent of partitioning.
  */
object Bm25Props extends Properties("Bm25") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def bitlen(x: BigInt): Int = x.bitLength // floor(log2)+1

  private val corpusGen: Gen[(List[List[String]], Int, Int)] = for {
    nDocs <- Gen.chooseNum(1, 12)
    docs <- Gen.listOfN(nDocs,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
        .map(_.take(10)))
    nQ <- Gen.chooseNum(1, 4)
    k <- Gen.chooseNum(1, 5)
  } yield (docs, nQ, k)

  private def refTopK(docs: Seq[(Long, Seq[String])],
      queries: Seq[(Long, String)], k: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val nd = BigInt(docs.size)
    val tt = BigInt(docs.map(_._2.size.toLong).sum)
    val postings = docs.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, l) =>
        (id, ws.size.toLong, w, l.size.toLong) // doc, dl, w, tf
      }
    }
    val dfm = postings.groupBy(_._3).map { case (w, l) =>
      w -> BigInt(l.map(_._1).distinct.size)
    } // postings are already (doc, w)-distinct, but be explicit
    val byQueryDoc = queries.flatMap { case (qid, w) =>
      postings.filter(_._3 == w).map { case (doc, dl, _, tf) =>
        val df = dfm(w)
        val ib = BigInt(
          (bitlen(2 * nd - 2 * df + 1) - 1) - (bitlen(2 * df + 1) - 1))
          .max(0)
        val num = 1000 * ib * 22 * BigInt(tf) * tt
        val den = 10 * tt * BigInt(tf) + 3 * tt + 9 * BigInt(dl) * nd
        (qid, doc) -> (num / den) // all non-neg: floor = truncate
      }
    }
    byQueryDoc.groupBy(_._1).toSeq.flatMap { case ((qid, doc), l) =>
      Seq(((qid, doc), (l.map(_._2).sum, l.size.toLong)))
    }.groupBy(_._1._1).toSeq.flatMap { case (qid, scored) =>
      scored.map { case ((_, doc), (s, n)) => (doc, s, n) }
        .sortBy { case (doc, s, _) => (-s, doc) }
        .zipWithIndex.take(k)
        .map { case ((doc, s, n), i) =>
          (qid, doc, s.toLong, n, i + 1L)
        }
    }.toSet
  }

  property("topK == sequential BigInt reference") =
    forAll(corpusGen) { case (docs, nQ, k) =>
      val ids = docs.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws)
      }
      val df = ids.map { case (i, ws) => (i, ws.mkString(" ")) }
        .toDF("doc_id", "text").repartition(4)
      // query qid=i uses the distinct terms of doc i (like q268)
      val queries = ids.take(nQ).flatMap { case (i, ws) =>
        ws.distinct.map(w => (i, w))
      }
      val qDf = queries.toDF("qid", "w").repartition(3)
      val got = Bm25.topK(df, "doc_id", col("text"), qDf, k)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      got == refTopK(ids, queries, k)
    }
}
