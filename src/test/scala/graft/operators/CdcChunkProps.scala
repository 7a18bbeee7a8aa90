package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: content-defined chunking ≡ a sequential driver
  * reference (60-bit md5 window hashes, cut-after-position rule,
  * final chunk always closes at n), the partition invariant (chunks
  * re-join to the exact token sequence), and the property the
  * operator exists FOR: chunkings of two documents sharing a suffix
  * RESYNC — every cut whose window lies fully inside the common
  * suffix coincides, so all chunks after the first common cut are
  * identical. Fixed-size chunking fails that property on the first
  * shifted token.
  */
object CdcChunkProps extends Properties("CdcChunk") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def md5Prefix60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Sequential reference: chunk strings in document order. */
  private def refChunks(toks: Seq[String], k: Int, m: Int)
      : Seq[String] = {
    val n = toks.length
    val cuts = (k to n).filter(j =>
      md5Prefix60(toks.slice(j - k, j).mkString(" ")) % m == 0)
    val ends = if (cuts.nonEmpty && cuts.last == n) cuts else cuts :+ n
    val starts = 1 +: ends.dropRight(1).map(_ + 1)
    starts.zip(ends).map { case (s, e) =>
      toks.slice(s - 1, e).mkString(" ") }
  }

  private def refCuts(toks: Seq[String], k: Int, m: Int): Seq[Int] =
    (k to toks.length).filter(j =>
      md5Prefix60(toks.slice(j - k, j).mkString(" ")) % m == 0)

  private val tokGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e")).map(_.take(40))

  private val cfgGen: Gen[(Int, Int)] = for {
    k <- Gen.chooseNum(1, 4)
    m <- Gen.chooseNum(2, 6)
  } yield (k, m)

  private def sparkChunks(docs: Seq[(Long, Seq[String])], k: Int,
      m: Int): Map[Long, Seq[String]] = {
    import org.apache.spark.sql.functions._
    docs.map { case (i, t) => (i, t.mkString(" ")) }
      .toDF("doc_id", "text").repartition(3)
      .select($"doc_id",
        CdcChunk.chunksOfTokens(
          graft.functions.TextFunctions.lowerTokens($"text"), k, m)
          .as("chunks"))
      .as[(Long, Seq[String])].collect().toMap
  }

  property("chunksOfTokens == sequential reference") =
    forAll(Gen.listOfN(5, tokGen), cfgGen) { case (docs, (k, m)) =>
      val ids = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = sparkChunks(ids, k, m)
      ids.forall { case (i, t) => got(i) == refChunks(t, k, m) }
    }

  property("chunks partition the token sequence exactly") =
    forAll(tokGen, cfgGen) { case (toks, (k, m)) =>
      refChunks(toks, k, m).mkString(" ") == toks.mkString(" ")
    }

  property("shared suffix => cuts resync => identical chunk tails") =
    forAll(tokGen, tokGen, tokGen, cfgGen) {
      case (xs, ys, zs, (k, m)) =>
        val a = xs ++ zs
        val b = ys ++ zs
        // cuts whose window [j-k+1, j] lies fully inside the shared
        // suffix depend only on zs: relative positions must agree
        def relCuts(prefix: Int, s: Seq[String]): Seq[Int] =
          refCuts(s, k, m).filter(_ >= prefix + k).map(_ - prefix)
        val ra = relCuts(xs.length, a)
        val rb = relCuts(ys.length, b)
        val resync = ra == rb
        // and chunks strictly after the first such cut are identical
        val tailsMatch = (ra.headOption, rb.headOption) match {
          case (Some(ca), Some(cb)) =>
            def tailChunks(prefix: Int, cut: Int, s: Seq[String]) =
              refChunks(s, k, m).scanLeft(0)(_ + _.split(" ", -1).length)
                .zip(refChunks(s, k, m))
                .collect { case (start, c) if start >= prefix + cut => c }
            tailChunks(xs.length, ca, a) == tailChunks(ys.length, cb, b)
          case _ => true
        }
        resync && tailsMatch
    }

  property("chunkStats counts: every doc appears, dup counts match " +
    "a brute-force occurrence map") =
    forAll(Gen.listOfN(6, tokGen), cfgGen) { case (docs, (k, m)) =>
      val ids = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = ids.map { case (i, t) => (i, t.mkString(" ")) }
        .toDF("doc_id", "text").repartition(3)
      val got = CdcChunk.chunkStats(df, "doc_id", "text", k, m)
        .as[(Long, Long, Long, Long)].collect()
        .map { case (d, nt, nc, nd) => d -> ((nt, nc, nd)) }.toMap
      val all = ids.map { case (i, t) => i -> refChunks(t, k, m) }
      val occ = all.flatMap(_._2).groupBy(identity).map {
        case (c, xs) => c -> xs.size }
      ids.forall { case (i, t) =>
        val chunks = all.toMap.apply(i)
        got(i) == ((t.length.toLong, chunks.length.toLong,
          chunks.count(c => occ(c) >= 2).toLong))
      }
    }
}
