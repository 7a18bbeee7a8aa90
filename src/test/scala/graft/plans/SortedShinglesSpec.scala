package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

class SortedShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("kernel is bit-identical to the composable HOF formulation, " +
    "including whitespace-edge and unicode inputs") {
    val rng = new scala.util.Random(7)
    val words = Seq("the", "Quick", "BROWN", "fox", "über", "naïve",
      "数据", "x1", "")
    val seps = Seq(" ", "  ", "\t", "\n", " \t ")
    val rows = (0 until 300).map { _ =>
      val k = rng.nextInt(9)
      Tuple1((0 until k).map(_ => words(rng.nextInt(words.length)))
        .mkString(seps(rng.nextInt(seps.length))))
    } ++ Seq(
      Tuple1(""), Tuple1("   "), Tuple1(" a b c "), Tuple1("a b"),
      Tuple1("a a a a a"))
    val df = rows.toDF("text")
    val mismatches = df.filter(
        !(TextFunctions.sortedShingles($"text") <=>
          TextFunctions.sortedShinglesFold($"text")))
      .select($"text", TextFunctions.sortedShingles($"text"),
        TextFunctions.sortedShinglesFold($"text"))
      .take(5)
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
  }

  test("NULL text yields an empty array (the HOF guard semantics), " +
    "short text too") {
    val df = Seq(Tuple1(null: String), Tuple1("one two")).toDF("text")
    val got = df.select(TextFunctions.sortedShingles($"text").as("sh"),
      TextFunctions.sortedShinglesFold($"text").as("fold")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == Seq.empty, r.toString)
      assert(r.getSeq[String](1) == Seq.empty, r.toString)
    }
  }

  test("output is sorted, distinct, and lowercased") {
    val got = Seq(Tuple1("B a B a B a c"))
      .toDF("text")
      .select(TextFunctions.sortedShingles($"text"))
      .head().getSeq[String](0)
    assert(got == got.sorted && got.distinct == got, got.toString)
    assert(got.contains("b a b") && got.contains("a b a"), got.toString)
  }
}
