package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: winnowing fingerprints ≡ a sequential driver reference
  * — 60-bit md5 k-gram hashes, per-window (hash, pos) argmin, distinct
  * selections, short-doc cutoff — plus the two Schleimer et al.
  * structural guarantees (density, shared-run detection) and the
  * sharedFingerprints pair counts, independent of partitioning.
  */
object WinnowProps extends Properties("Winnow") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def md5Prefix60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Sequential winnow: (doc, pos, fp) selections. */
  private def refFingerprints(docs: Seq[(Long, Seq[String])], k: Int,
      w: Int): Set[(Long, Long, Long)] =
    docs.flatMap { case (id, toks) =>
      val grams = toks.sliding(k).filter(_.size == k)
        .map(_.mkString(" ")).toVector
      val hs = grams.map(md5Prefix60)
      // windows of w consecutive k-gram hashes; argmin by (hash, pos)
      (0 to hs.size - w).flatMap { start =>
        val cand = (start until start + w).map(p => (hs(p), p + 1L))
        Seq(cand.min)
      }.distinct.map { case (hv, pos) => (id, pos, hv) }
    }.toSet

  private val corpusGen: Gen[(List[List[String]], Int, Int)] = for {
    nDocs <- Gen.chooseNum(1, 8)
    docs <- Gen.listOfN(nDocs,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d")).map(_.take(24)))
    k <- Gen.chooseNum(1, 4)
    w <- Gen.chooseNum(1, 4)
  } yield (docs, k, w)

  property("fingerprints == sequential reference") =
    forAll(corpusGen) { case (docs, k, w) =>
      val ids = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = ids.map { case (i, t) => (i, t.mkString(" ")) }
        .toDF("doc_id", "text").repartition(4)
      val got = Winnow.fingerprints(df, "doc_id", "text", k, w)
        .as[(Long, Long, Long)].collect().toSet
      got == refFingerprints(ids, k, w)
    }

  property("density + shared-run guarantee") =
    forAll(for {
      shared <- Gen.listOfN(12, Gen.oneOf("x", "y", "z"))
      pre <- Gen.listOf(Gen.oneOf("a", "b")).map(_.take(10))
      post <- Gen.listOf(Gen.oneOf("c", "d")).map(_.take(10))
    } yield (shared, pre, post)) { case (shared, pre, post) =>
      val k = 5; val w = 4
      // doc 0 and doc 1 share a run of 12 >= w + k - 1 = 8 tokens
      val ids = Seq((0L, pre ++ shared), (1L, shared ++ post))
      val df = ids.map { case (i, t) => (i, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val fps = Winnow.fingerprints(df, "doc_id", "text", k, w)
        .as[(Long, Long, Long)].collect()
      val byDoc = fps.groupBy(_._1).view
        .mapValues(_.map(_._3).toSet).toMap
      val guarantee = byDoc.getOrElse(0L, Set.empty)
        .intersect(byDoc.getOrElse(1L, Set.empty)).nonEmpty
      // selection count bounded by the number of complete windows
      val bounded = ids.forall { case (id, toks) =>
        val nWin = math.max(toks.size - k + 1 - w + 1, 0)
        fps.count(_._1 == id) <= nWin
      }
      guarantee && bounded
    }

  property("sharedFingerprints == brute-force pair counts") =
    forAll(corpusGen) { case (docs, k, w) =>
      val ids = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = ids.map { case (i, t) => (i, t.mkString(" ")) }
        .toDF("doc_id", "text").repartition(4)
      val maxDf = 3
      val fps = Winnow.fingerprints(df, "doc_id", "text", k, w)
      val got = Winnow.sharedFingerprints(fps, maxDf)
        .as[(Long, Long, Long)].collect().toSet
      val sel = refFingerprints(ids, k, w)
        .map { case (d, _, fp) => (d, fp) } // doc-distinct
      val byFp = sel.groupBy(_._2).filter { case (_, s) =>
        s.size >= 2 && s.size <= maxDf
      }
      val want = byFp.toSeq.flatMap { case (_, s) =>
        val ds = s.map(_._1).toSeq.sorted
        for (a <- ds; b <- ds if a < b) yield (a, b)
      }.groupBy(identity).map { case ((a, b), l) =>
        (a, b, l.size.toLong)
      }.toSet
      got == want
    }
}
