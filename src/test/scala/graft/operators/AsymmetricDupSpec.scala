package graft.operators

import graft.SparkSpec

/** The asymmetric-dup laws on constructed corpora: a verbatim copy
  * pair scores containment 10⁴ on BOTH sides; a short doc quoted
  * inside a much larger one scores 10⁴ for the quoted doc but less
  * for the host (the asymmetry resemblance misses); disjoint docs
  * never appear. Incremental CDC: a delta doc copying a history doc
  * dedups fully (dup_bp = 10⁴), a vocabulary-disjoint delta doc not
  * at all, and re-crawl-with-insertion dedups most chunks (the CDC
  * resync property end-to-end).
  */
class AsymmetricDupSpec extends SparkSpec {
  import spark.implicits._

  private def words(s: String*): String = s.mkString(" ")

  test("containment: copy pair = 10000 both ways; quoted-inside is " +
    "asymmetric; disjoint docs absent") {
    // A (20 tokens), B = copy of A, H = A's text + 40 junk tokens,
    // Z disjoint, J = the junk region alone (so H's junk fingerprints
    // reach df >= 2 and stay on the capped index — without J they
    // are singletons, fall off the index, and H would trivially
    // score 10^4 against its A-region partner)
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val junk = (1 to 40).map(i => s"j$i").mkString(" ")
    val host = a + " " + junk
    val z = (1 to 30).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, a), (2L, a), (3L, host), (4L, z), (5L, junk))
      .toDF("doc_id", "text").repartition(3)
    val got = Winnow.containment(df, "doc_id", "text",
        k = 5, w = 4, maxDf = 20)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // copies contain each other fully
    assert(got(1L)._3 == 10000L, s"doc1 should be fully contained: $got")
    assert(got(2L)._3 == 10000L, s"doc2 should be fully contained: $got")
    // A's fingerprints all exist in host (host extends A's text), so
    // A is fully contained in SOMETHING (its copy or the host); the
    // host itself holds junk-region fingerprints nobody shares
    assert(got(3L)._3 < 10000L,
      s"host must NOT be fully contained: ${got(3L)}")
    assert(got(3L)._3 > 0L, s"host shares A's region: ${got(3L)}")
    // disjoint doc never appears (no shared fingerprint)
    assert(!got.contains(4L), s"disjoint doc must be absent: $got")
  }

  test("incremental CDC: copy dedups fully, disjoint not at all, " +
    "insertion re-crawl dedups past the resync point") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val inserted = ((1 to 30).map(i => s"w$i") ++ Seq("INS") ++
      (31 to 60).map(i => s"w$i")).mkString(" ")
    val fresh = (1 to 40).map(i => s"f$i").mkString(" ")
    val df = Seq(
      (1L, base),      // history
      (10L, base),     // delta: verbatim re-crawl
      (11L, inserted), // delta: re-crawl with one inserted token
      (12L, fresh))    // delta: new content
      .toDF("doc_id", "text").repartition(3)
    val got = CdcChunk.incrementalDupStats(df, "doc_id", "text",
        cut = 5L, k = 3, m = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(10L)._3 == 10000L, s"verbatim copy must fully dedup: $got")
    assert(got(12L)._3 == 0L, s"fresh content must not dedup: $got")
    val (nc, nd, bp) = got(11L)
    assert(nd > 0 && bp < 10000L,
      s"insertion re-crawl should partially dedup: $got")
    // the CDC promise: chunks resync after the edit, so MOST chunks
    // (all but the O(1) around the insertion) are recovered
    assert(nd >= nc - 4,
      s"expected all but ~3 chunks recovered after resync: $got")
  }
}
