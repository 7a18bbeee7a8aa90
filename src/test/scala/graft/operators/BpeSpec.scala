package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bpe unit fixtures: the wrapped-symbol representation's edge cases
  * (runs of identical symbols, symbol-suffix false matches, single-char
  * and merged-symbol participants), learning determinism, and the
  * encode chain end-to-end.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def tokensOf(word: String, merges: Seq[Bpe.Merge]): Seq[String] =
    Seq(word).toDF("w")
      .select(Bpe.encodeTokens($"w", merges).as("t"))
      .as[Seq[String]].head()

  test("wrap/unwrap round-trips single chars") {
    val out = Seq("key").toDF("w")
      .select(Bpe.wrap($"w").as("s"))
      .as[String].head()
    assert(out == "|k||e||y|")
    val back = Seq(out).toDF("s").select(Bpe.unwrap($"s").as("t"))
      .as[Seq[String]].head()
    assert(back == Seq("k", "e", "y"))
  }

  test("merge sweep is left-to-right non-overlapping on runs") {
    // aaa → [aa, a]; aaaa → [aa, aa] — the greedy-leftmost results
    val m = Seq(Bpe.Merge("a", "a", 0L))
    assert(tokensOf("aaa", m) == Seq("aa", "a"))
    assert(tokensOf("aaaa", m) == Seq("aa", "aa"))
    assert(tokensOf("aaaaa", m) == Seq("aa", "aa", "a"))
  }

  test("merge never matches a symbol suffix") {
    // (a,b) must not fire inside "xab": 'a' there is the tail of no
    // symbol — each symbol carries its own fences
    val m = Seq(Bpe.Merge("a", "b", 0L))
    assert(tokensOf("xab", m) == Seq("x", "ab"))
    val m2 = Seq(Bpe.Merge("a", "b", 0L), Bpe.Merge("x", "ab", 0L))
    assert(tokensOf("xab", m2) == Seq("xab"))
    // and a merged symbol participates as a unit, not per-char
    val m3 = Seq(Bpe.Merge("a", "b", 0L), Bpe.Merge("b", "a", 0L))
    assert(tokensOf("abba", m3) == Seq("ab", "ba"))
  }

  test("learn picks count-desc then pair-asc, and applies as it goes") {
    // corpus: "aab" x3, "ab" x2 → pairs: (a,a)=3, (a,b)=5 → merge1=(a,b)
    // after merge1: words [a,ab] x3, [ab] x2 → (a,ab)=3 → merge2=(a,ab)
    val wf = Seq(("aab", 3L), ("ab", 2L)).toDF("w", "f")
    val merges = Bpe.learn(wf, 3)
    assert(merges.take(2) ==
      Seq(Bpe.Merge("a", "b", 5L), Bpe.Merge("a", "ab", 3L)))
    // third round: no pairs left anywhere → early stop
    assert(merges.size == 2)
  }

  test("learn tie-break is lexicographic on (a, b)") {
    val wf = Seq(("ba", 1L), ("ab", 1L)).toDF("w", "f")
    val merges = Bpe.learn(wf, 1)
    assert(merges == Seq(Bpe.Merge("a", "b", 1L)))
  }

  test("encode of an unseen word with learned merges") {
    val wf = Seq(("lowlow", 5L), ("low", 2L)).toDF("w", "f")
    val merges = Bpe.learn(wf, 2)
    assert(merges.map(m => (m.a, m.b)) == Seq(("l", "o"), ("lo", "w")))
    assert(tokensOf("slow", merges) == Seq("s", "low"))
    assert(tokensOf("lowest", merges) == Seq("low", "e", "s", "t"))
  }

  test("learn survives 64+ merge rounds (periodic localCheckpoint " +
    "cuts the replace-chain lineage) and still matches the " +
    "sequential reference") {
    // enough pair diversity to sustain >64 distinct merges: 40 words
    // over an 8-letter alphabet, deterministic pseudo-random content
    val words = (0 until 40).map { i =>
      val sb = new StringBuilder
      var x = i * 2654435761L + 17
      for (_ <- 0 until 14) {
        x = x * 6364136223846793005L + 1442695040888963407L
        sb += ('a' + ((x >>> 33) % 8)).toChar
      }
      (sb.toString, (i % 5 + 1).toLong)
    }
    val merges = Bpe.learn(words.toDF("w", "f"), 64)
    assert(merges.size == 64, s"expected 64 merges, got ${merges.size}")
    // sequential reference (the BpeProps fold) on the same corpus
    def applyMerge(syms: List[String], a: String, b: String)
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
    var ws = words.toList.map { case (w, f) =>
      w.toList.map(_.toString) -> f }
    merges.foreach { m =>
      val pc = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      ws.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => pc(p) += f) }
      val ((a, b), cnt) = pc.minBy { case ((x, y), c) => (-c, x, y) }
      assert((m.a, m.b, m.cnt) == (a, b, cnt),
        s"merge diverged from reference at rank: $m vs ($a,$b,$cnt)")
      ws = ws.map { case (syms, f) => applyMerge(syms, a, b) -> f }
    }
  }

  test("wordFreq filters non-alnum and counts occurrences") {
    val docs = Seq("The cat -- the CAT", "cat!").toDF("text")
    val wf = Bpe.wordFreq(docs, $"text").as[(String, Long)].collect().toMap
    assert(wf == Map("the" -> 2L, "cat" -> 2L))
  }
}
