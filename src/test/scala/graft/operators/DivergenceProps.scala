package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: [[Profile.sourceDivergence]] ≡ a sequential BigInt
  * reference that materializes the FULL source × vocab grid (the
  * operator folds the missing-word TVD mass algebraically — the
  * reference does not, so the algebra itself is under test),
  * independent of partitioning. Covers the single-source degeneracy
  * (rest-of-corpus empty → tvd 0).
  */
object DivergenceProps extends Properties("SourceDivergence") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")

  private val genDocs: Gen[List[(String, String)]] = for {
    nSrc <- Gen.chooseNum(1, 4)
    n <- Gen.chooseNum(1, 15)
    docs <- Gen.listOfN(n, for {
      s <- Gen.chooseNum(0, nSrc - 1)
      len <- Gen.chooseNum(1, 12)
      toks <- Gen.listOfN(len, Gen.oneOf(words))
    } yield (s"src$s", toks.mkString(" ")))
  } yield docs

  private def ref(docs: List[(String, String)])
      : Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val toks = docs.flatMap { case (s, t) =>
      t.toLowerCase.split("\\s+").map(s -> _)
    }
    val bySrc = toks.groupBy(_._1)
    val corpus = toks.groupBy(_._2).map { case (w, l) => w -> l.size }
    val nn = BigInt(toks.size)
    bySrc.toSeq.sortBy(_._1).map { case (s, st) =>
      val cs = st.groupBy(_._2).map { case (w, l) => w -> l.size }
      val ns = BigInt(st.size)
      val nr = nn - ns
      val uniq = cs.keys.filter(w => corpus(w) == cs(w)).toSeq
      val um = BigInt(uniq.map(cs).sum)
      // full-grid TVD: every corpus word, source count vs rest count
      // keysIterator, not keys: Set.map would DEDUP equal |a−b| terms
      val sabs = corpus.keysIterator.map { w =>
        val a = BigInt(cs.getOrElse(w, 0)) * nr
        val b = BigInt(corpus(w) - cs.getOrElse(w, 0)) * ns
        (a - b).abs
      }.sum
      val tvd =
        if (ns == 0 || nr == 0) BigInt(0)
        else (10000 * sabs) / (2 * ns * nr)
      (s, ns.toLong, cs.size.toLong, uniq.size.toLong, um.toLong,
        if (ns == 0) 0L else (10000 * um / ns).toLong, tvd.toLong)
    }
  }

  property("sourceDivergence == full-grid BigInt reference") =
    forAll(genDocs) { docs =>
      val df = docs.toDF("source", "text").repartition(4)
      val got = Profile.sourceDivergence(df, "source", col("text"))
        .as[(String, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
      got == ref(docs)
    }
}
