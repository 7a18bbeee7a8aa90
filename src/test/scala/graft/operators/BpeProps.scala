package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** Bpe vs driver-side references on random tiny corpora.
  *
  * Two laws:
  *  1. `learn` ≡ the textbook induction fold (count every adjacent
  *     position, argmax with (count desc, a, b) tie-break, greedy
  *     left-to-right apply). Small alphabet on purpose — runs like
  *     "aaa" and re-merges of merged symbols are the hard cases.
  *  2. `encodeTokens` (rank-ordered sweep chain) ≡ the greedy
  *     "repeatedly merge the lowest-ranked pair present" reference —
  *     the equivalence theorem the scale path rests on, checked on
  *     words the learner never saw.
  */
object BpeProps extends Properties("Bpe") {
  private lazy val spark = SparkSpec.session

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  // ---- reference implementation --------------------------------------
  private def applyMerge(syms: List[String], a: String, b: String)
      : List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) rest match {
      case x :: y :: t if x == a && y == b => out += (a + b); rest = t
      case x :: t => out += x; rest = t
      case Nil => ()
    }
    out.result()
  }

  private def learnRef(wf: Map[String, Long], rounds: Int)
      : List[(String, String, Long)] = {
    var words = wf.map { case (w, f) => w.toList.map(_.toString) -> f }.toList
    val merges = List.newBuilder[(String, String, Long)]
    var r = 0
    var stop = false
    while (r < rounds && !stop) {
      val pc = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      words.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => pc(p) += f) }
      if (pc.isEmpty) stop = true
      else {
        val ((a, b), cnt) = pc.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((a, b, cnt))
        words = words.map { case (syms, f) => applyMerge(syms, a, b) -> f }
        r += 1
      }
    }
    merges.result()
  }

  private def greedyEncode(word: String,
      merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.toList.map(_.toString)
    var done = false
    while (!done) {
      val present = syms.zip(syms.drop(1)).flatMap(rank.get)
      if (present.isEmpty) done = true
      else {
        val (a, b) = merges(present.min)
        syms = applyMerge(syms, a, b)
      }
    }
    syms
  }

  // ---- generators ----------------------------------------------------
  private val word: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', '0'))
  } yield cs.mkString

  private val corpusGen: Gen[Map[String, Long]] = for {
    n <- Gen.choose(1, 12)
    ws <- Gen.listOfN(n, word)
    fs <- Gen.listOfN(n, Gen.choose(1L, 9L))
  } yield ws.zip(fs).groupMapReduce(_._1)(_._2)(_ + _)

  // ---- properties ----------------------------------------------------
  property("learn == reference induction fold") = forAll(
    corpusGen, Gen.choose(1, 6)) { (wf, rounds) =>
    import spark.implicits._
    val got = Bpe.learn(wf.toSeq.toDF("w", "f"), rounds)
      .map(m => (m.a, m.b, m.cnt))
    got == learnRef(wf, rounds)
  }

  property("rank-order encode == greedy lowest-rank encode") = forAll(
    corpusGen, Gen.choose(1, 6), Gen.listOfN(6, word)) {
    (wf, rounds, unseen) =>
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val merges = Bpe.learn(wf.toSeq.toDF("w", "f"), rounds)
    val words = (wf.keySet ++ unseen).toSeq.sorted
    val got = words.toDF("w")
      .select($"w", Bpe.encodeTokens($"w", merges).as("t"))
      .as[(String, Seq[String])].collect().toMap
    words.forall { w =>
      got(w).toList == greedyEncode(w, merges.map(m => (m.a, m.b)))
    }
  }

  property("encode is lossless: tokens concatenate back to the word") =
    forAll(corpusGen, Gen.choose(1, 6), Gen.listOfN(6, word)) {
    (wf, rounds, unseen) =>
    import spark.implicits._
    val merges = Bpe.learn(wf.toSeq.toDF("w", "f"), rounds)
    val words = (wf.keySet ++ unseen).toSeq.sorted
    words.toDF("w")
      .select($"w", Bpe.encodeTokens($"w", merges).as("t"))
      .as[(String, Seq[String])].collect()
      .forall { case (w, t) => t.mkString == w }
  }
}
