package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.SparkSpec

/** [[ExactSubstr]] vs a quadratic sequential reference: on tiny-vocab
  * corpora (maximizing shared runs, repeats, and overlapping marks
  * from different partners), the marked-side merged intervals must
  * cover EXACTLY the token positions lying in some maximal
  * cross-document common run of length ≥ minTokens with a lower-id
  * partner — and [[ExactSubstr.strip]] must rebuild each doc from
  * precisely the unmarked tokens. Also pins interval-union hygiene
  * (disjoint, non-touching, within-doc) and the minTokens ≥ k cut
  * (runs of k..minTokens−1 shared tokens survive).
  */
object ExactSubstrProps extends Properties("ExactSubstr") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val k = 3

  private val docGen: Gen[String] =
    Gen.choose(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))

  private val corpusGen: Gen[(List[String], Int)] = for {
    n <- Gen.choose(2, 6)
    texts <- Gen.listOfN(n, docGen)
    minTokens <- Gen.choose(k, k + 3)
  } yield (texts, minTokens)

  private def tokensOf(text: String): Vector[String] =
    text.toLowerCase.split("\\s+").toVector.filter(_.nonEmpty)

  /** All b-side token positions covered by a maximal common run of
    * length ≥ minTokens against some lower-id doc — O(n·m) diagonal
    * scan per pair.
    */
  private def refMarks(docs: Seq[(Long, Vector[String])],
      minTokens: Int): Map[Long, Set[Int]] = {
    val out = scala.collection.mutable.Map.empty[Long, Set[Int]]
    for ((ia, ta) <- docs; (ib, tb) <- docs if ia < ib) {
      for (d <- -(tb.length - 1) to math.max(ta.length - 1, 0)) {
        var j = math.max(0, -d)
        while (j < tb.length && j + d < ta.length) {
          if (j + d >= 0 && ta(j + d) == tb(j)) {
            val s = j
            while (j < tb.length && j + d < ta.length &&
              ta(j + d) == tb(j)) j += 1
            if (j - s >= minTokens)
              out(ib) = out.getOrElse(ib, Set.empty) ++ (s until j)
          } else j += 1
        }
      }
    }
    out.toMap
  }

  property("dupSpans == sequential diagonal reference (as position " +
    "sets), intervals disjoint and in-bounds") =
    forAll(corpusGen) { case (texts, minTokens) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = ExactSubstr.dupSpans(
          docs.toDF("doc_id", "text").repartition(3),
          "doc_id", "text", k, minTokens)
        .as[(Long, Long, Long)].collect()
      val gotSets = got.groupBy(_._1).map { case (d, ss) =>
        d -> ss.flatMap { case (_, s, l) =>
          (s.toInt until (s + l).toInt)
        }.toSet
      }
      val toks = docs.map { case (id, t) => id -> tokensOf(t) }
      val expect = refMarks(toks, minTokens)
      val disjoint = got.groupBy(_._1).forall { case (_, ss) =>
        val sorted = ss.sortBy(_._2)
        sorted.zip(sorted.drop(1)).forall { case ((_, s1, l1), (_, s2, _)) =>
          s2 > s1 + l1 // strictly non-touching after the union
        }
      }
      val inBounds = got.forall { case (d, s, l) =>
        val n = toks.toMap.apply(d).length
        s >= 0 && l >= minTokens && s + l <= n
      }
      gotSets == expect && disjoint && inBounds
    }

  property("incrementalDupSpans == full dupSpans restricted to the " +
    "delta docs (append-only id contract)") =
    forAll(corpusGen) { case (texts, minTokens) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val cut = docs.size / 2
      val hist = docs.filter(_._1 < cut)
      val delta = docs.filter(_._1 >= cut)
      (hist.nonEmpty && delta.nonEmpty) ==> {
        val full = ExactSubstr.dupSpans(
            docs.toDF("doc_id", "text").repartition(3),
            "doc_id", "text", k, minTokens)
          .as[(Long, Long, Long)].collect()
          .filter(_._1 >= cut).toSet
        val inc = ExactSubstr.incrementalDupSpans(
            hist.toDF("doc_id", "text"),
            delta.toDF("doc_id", "text").repartition(2),
            "doc_id", "text", k, minTokens)
          .as[(Long, Long, Long)].collect().toSet
        inc == full
      }
    }

  property("incrementalDupSpans FAILS LOUDLY when a history id sits " +
    "above a colliding delta id") = {
    val shared = Vector.fill(8)("a").mkString(" ")
    val hist = Seq((5L, shared)).toDF("doc_id", "text")
    val delta = Seq((0L, shared)).toDF("doc_id", "text")
    try {
      ExactSubstr.incrementalDupSpans(hist, delta,
        "doc_id", "text", k, minTokens = k).collect()
      false // silent mis-marking — the contract the assert guards
    } catch {
      case e: Throwable =>
        Iterator.iterate[Throwable](e)(_.getCause)
          .takeWhile(_ != null).take(8)
          .exists(t => Option(t.getMessage)
            .exists(_.contains("history ids must all be below")))
    }
  }

  property("strip rebuilds each doc from exactly the unmarked tokens") =
    forAll(corpusGen) { case (texts, minTokens) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = ExactSubstr.strip(
          docs.toDF("doc_id", "text").repartition(2),
          "doc_id", "text", k, minTokens)
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      val toks = docs.map { case (id, t) => id -> tokensOf(t) }
      val marks = refMarks(toks, minTokens)
      docs.forall { case (id, text) =>
        val tk = tokensOf(text)
        val m = marks.getOrElse(id, Set.empty)
        val kept = tk.zipWithIndex.collect {
          case (w, i) if !m.contains(i) => w
        }
        val (cleanText, nTokens, nRemoved) = got(id)
        // lowerTokens of "" yields [""] — both sides then keep a
        // single empty token; normalize by comparing joined strings
        cleanText == kept.mkString(" ") &&
          (nTokens == tk.length ||
            (text.trim.isEmpty && nTokens == 1)) &&
          nRemoved == m.size
      }
    }
}
