package graft.operators

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** The three Distributional kernels vs driver-side reference folds on
  * random tiny corpora. The folds replicate the exact semantics the
  * Spark arms (and the DuckDB oracles) share: `split(lower(t),'\s+')`
  * with limit −1 (KEEPS leading/trailing empty tokens — "" tokenizes
  * to [""]), the md5-prefix bucket hash via the very same
  * [[graft.plans.Md5PrefixLong.hash]] kernel, `math.log` (what
  * Catalyst's Log evaluates), and per-cell ⌊ln·10⁶⌋ milli-nats with
  * integer accumulation. Corpora include empty texts, single chars,
  * duplicate tokens, multi-byte BMP characters, and sources/langs with
  * zero overlap — the places a smoothing or dense-grid bug hides.
  */
object DistributionalProps extends Properties("Distributional") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val B = 64 // small bucket space → frequent collisions, on purpose

  private def tokens(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1).toSeq

  private def bucket(w: String): Long =
    graft.plans.Md5PrefixLong.hash(UTF8String.fromString(w), 15) % B

  private def mnat(num: Long, den: Long): Long =
    math.floor(math.log(num.toDouble / den.toDouble) * 1e6).toLong

  // ---- generators ----------------------------------------------------
  private val word: Gen[String] = Gen.oneOf(
    "the", "cat", "sat", "perro", "gato", "数据", "étoile", "x1", "--")
  private val textGen: Gen[String] = Gen.frequency(
    (1, Gen.const("")),
    (8, Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))))

  private val corpusGen: Gen[List[(Long, String, String)]] =
    Gen.choose(2, 10).flatMap(n =>
      Gen.sequence[List[(Long, String, String)], (Long, String, String)](
        (1 to n).map(i => for {
          src <- Gen.oneOf("sa", "sb", "sc")
          t <- textGen
        } yield (i.toLong, src, t))))

  // ---- DSIR ----------------------------------------------------------
  private def dsirRef(docs: Seq[(Long, String, String)],
      targets: Set[String]): Map[(Long, String), (Long, Long)] = {
    val toks = docs.map { case (id, src, t) =>
      (id, src, targets(src), tokens(t).map(bucket)) }
    val tc = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val rc = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    toks.foreach { case (_, _, isTgt, bs) =>
      bs.foreach(b => if (isTgt) tc(b) += 1 else rc(b) += 1) }
    val tt = tc.values.sum
    val rt = rc.values.sum
    def llr(b: Long): Long =
      mnat((tc(b) + 1) * (rt + B), (rc(b) + 1) * (tt + B))
    toks.filterNot(_._3).collect { case (id, src, _, bs) if bs.nonEmpty =>
      (id, src) -> (bs.map(llr).sum, bs.size.toLong)
    }.toMap
  }

  property("dsirScores equals the sequential LLR fold") =
    forAll(corpusGen) { corpus =>
      val targets = Set("sa")
      val df = corpus.toDF("doc_id", "source", "text").repartition(5)
      val got = Distributional
        .dsirScores(df, df("source").isin("sa"), b = B)
        .as[(Long, String, Long, Long)].collect()
        .map { case (id, src, s, n) => (id, src) -> (s, n) }.toMap
      val expected = dsirRef(corpus, targets)
      val ok = got == expected
      if (!ok) println(s"corpus=$corpus\ngot=$got\nexpected=$expected")
      ok
    }

  // ---- surprisal -----------------------------------------------------
  private val charAlphabet = "ab 中é\tz"
  private val langTextGen: Gen[(Long, String, String)] = for {
    id <- Gen.choose(1L, 1000L)
    lang <- Gen.oneOf("en", "zz")
    n <- Gen.choose(0, 10)
    cs <- Gen.listOfN(n, Gen.oneOf(charAlphabet.toSeq))
  } yield (id, lang, cs.mkString)

  private def surprisalRef(docs: Seq[(Long, String, String)])
      : Map[(Long, String), Long] = {
    val withBg = docs
      .map { case (id, lang, t) =>
        (id, lang, (0 until math.max(0, t.length - 1))
          .map(i => t.substring(i, i + 2))) }
      .filter(_._3.nonEmpty)
    val bc = collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    withBg.foreach { case (_, lang, bgs) =>
      bgs.foreach(g => bc((lang, g)) += 1) }
    val cc = bc.groupBy { case ((lang, g), _) => (lang, g.substring(0, 1)) }
      .map { case (k, m) => k -> m.values.sum }
    withBg.map { case (id, lang, bgs) =>
      val tot = bgs.map(g =>
        mnat(cc((lang, g.substring(0, 1))), bc((lang, g)))).sum
      (id, lang) -> tot / bgs.size
    }.toMap
  }

  property("surprisal equals the sequential bigram-LM fold") =
    forAll(Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, langTextGen))) { docs0 =>
      // doc_id must be unique per (doc, lang) for the map compare
      val docs = docs0.zipWithIndex.map { case ((_, l, t), i) =>
        (i.toLong, l, t) }
      val df = docs.toDF("doc_id", "lang", "text").repartition(3)
      val got = Distributional.surprisal(df)
        .as[(Long, String, Long)].collect()
        .map { case (id, lang, s) => (id, lang) -> s }.toMap
      val expected = surprisalRef(docs)
      val ok = got == expected
      if (!ok) println(s"docs=$docs\ngot=$got\nexpected=$expected")
      ok
    }

  // ---- source KL -----------------------------------------------------
  private def klRef(docs: Seq[(Long, String, String)])
      : Map[(String, String), Long] = {
    val counts = collection.mutable.Map.empty[(String, Long), Long]
      .withDefaultValue(0L)
    docs.foreach { case (_, src, t) =>
      tokens(t).foreach(w => counts((src, bucket(w))) += 1) }
    val sources = docs.map(_._2).distinct
    val tot = sources.map(s =>
      s -> (0L until B).map(b => counts((s, b))).sum).toMap
    (for {
      p <- sources; q <- sources if p != q
    } yield (p, q) -> (0L until B).map { b =>
      val np = counts((p, b)); val nq = counts((q, b))
      (np + 1) * mnat((np + 1) * (tot(q) + B), (nq + 1) * (tot(p) + B))
    }.sum).toMap
  }

  property("sourceKl equals the dense-grid fold") =
    forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "source", "text")
        .select($"source", $"text").repartition(4)
      val got = Distributional.sourceKl(df, b = B)
        .as[(String, String, Long)].collect()
        .map { case (p, q, k) => (p, q) -> k }.toMap
      val expected = klRef(corpus)
      val ok = got == expected
      if (!ok) println(s"corpus=$corpus\ngot=$got\nexpected=$expected")
      ok
    }
}
