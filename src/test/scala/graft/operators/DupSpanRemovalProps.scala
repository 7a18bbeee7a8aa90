package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the distributed duplicated-span removal equals a
  * sequential reference — same 60-bit md5 span hash, same
  * lexicographic (doc, pos) canonical-first rule, within-doc repeats
  * included — over adversarial tiny-vocabulary corpora (2 letters ×
  * k = 3 makes collisions the norm), any partitioning; a repeat-free
  * corpus passes through untouched.
  */
object DupSpanRemovalProps extends Properties("DupSpanRemoval") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val K = 3

  private def md5Prefix60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def reference(docs: List[(Long, String)])
      : Map[Long, (String, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").toList
    }.toMap
    val occ = for {
      (id, ts) <- toks.toList
      pos <- 0 to ts.size - K
    } yield (md5Prefix60(ts.slice(pos, pos + K).mkString(" ")), id, pos)
    val canon = occ.groupBy(_._1).view
      .mapValues(_.map { case (_, d, p) => (d, p) }.min).toMap
    val marked = occ.filter { case (h, d, p) => canon(h) != ((d, p)) }
      .flatMap { case (_, d, p) => (p until p + K).map(d -> _) }.toSet
    toks.map { case (id, ts) =>
      val kept = ts.zipWithIndex.collect {
        case (w, i) if !marked((id, i)) => w
      }
      id -> (kept.mkString(" "), ts.size.toLong,
        (ts.size - kept.size).toLong)
    }
  }

  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(
      Gen.listOfN(9, Gen.oneOf("a", "b"))
        .flatMap(ws => Gen.chooseNum(0, 9).map(n =>
          ws.take(n + 1).mkString(" "))))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  property("removeDupSpans == sequential canonical-first reference") =
    forAll(corpusGen) { docs =>
      val got = Dedup.removeDupSpans(
          docs.toDF("doc_id", "text").repartition(4),
          "doc_id", "text", K)
        .as[(Long, String, Long, Long)].collect()
        .map { case (id, c, n, r) => id -> ((c, n, r)) }.toMap
      got == reference(docs)
    }

  property("repeat-free corpus passes through untouched") = {
    val docs = List((0L, "q w e r t"), (1L, "y u i o p"))
    val got = Dedup.removeDupSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", K)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toList
    got == List((0L, "q w e r t", 5L, 0L), (1L, "y u i o p", 5L, 0L))
  }

  property("a verbatim copy of an earlier doc empties completely; " +
      "the original survives") = {
    val docs = List((0L, "a b c d e"), (1L, "a b c d e"))
    val got = Dedup.removeDupSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", K)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toList
    got == List((0L, "a b c d e", 5L, 0L), (1L, "", 5L, 5L))
  }
}

/** ScalaCheck: the PMI floor-bit table equals a sequential fold —
  * same transition counts, same bit lengths, same deterministic cut.
  */
object PmiProps extends Properties("Pmi") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private def flog2(v: Long): Long =
    63 - java.lang.Long.numberOfLeadingZeros(v)

  private val textsGen: Gen[List[String]] = Gen.nonEmptyListOf(
    Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd"))
      .map(_.mkString(" ")))

  property("pmiTopK == sequential fold (counts, bits, cut order)") =
    forAll(textsGen) { texts =>
      val got = Profile.pmiTopK(
          texts.map(Tuple1(_)).toDF("text").repartition(3),
          org.apache.spark.sql.functions.col("text"), 2L, 1000)
        .as[(String, String, Long, Long, Long, Long, Long)]
        .collect().toList
      val tr = texts.flatMap { t =>
        val ts = t.split("\\s+").toList
        ts.zip(ts.drop(1))
      }
      val bi = tr.groupBy(identity).view.mapValues(_.size.toLong)
      val c1 = tr.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val c2 = tr.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = tr.size.toLong
      val want = bi.toList.collect { case ((w1, w2), c12) if c12 >= 2 =>
        val bits = flog2(c12) + flog2(n) - flog2(c1(w1)) - flog2(c2(w2))
        (w1, w2, c12, c1(w1), c2(w2), n, bits)
      }.sortBy { case (w1, w2, c12, _, _, _, bits) =>
        (-bits, -c12, w1, w2)
      }
      got == want
    }
}
