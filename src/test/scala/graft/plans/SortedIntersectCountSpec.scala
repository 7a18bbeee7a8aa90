package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("merge walk equals array_intersect size on random sorted sets") {
    val rng = new scala.util.Random(5)
    val words = ('a' to 'z').map(_.toString)
    val rows = (0 until 300).map { _ =>
      def set() = rng.shuffle(words).take(rng.nextInt(20)).sorted
      (set(), set())
    }
    val df = rows.toDF("a", "b")
    val bad = df.filter(
      SortedIntersectCount($"a", $"b") =!=
        size(array_intersect($"a", $"b")))
    assert(bad.count() == 0)
  }

  test("null elements skipped; empty arrays yield 0") {
    val df = Seq(
      (Seq[String](), Seq("a", "b")),
      (Seq("a", "b"), Seq("a", "b"))).toDF("a", "b")
    val got = df.select(SortedIntersectCount($"a", $"b"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 2))
  }

  test("jaccardSorted equals jaccard") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog entirely"),
      (2L, "the quick brown fox leaps over the lazy dog entirely"),
      (3L, "unrelated words with no common trigrams at all today"))
      .toDF("id", "text")
      .select($"id",
        graft.functions.TextFunctions.shingles($"text").as("sh"))
    val a = docs.as("a"); val b = docs.as("b")
    val pairs = a.join(b, col("a.id") < col("b.id"))
    val bad = pairs.filter(
      abs(Dedup.jaccardSorted(array_sort(col("a.sh")),
        array_sort(col("b.sh"))) -
        Dedup.jaccard(col("a.sh"), col("b.sh"))) > 1e-12)
    assert(bad.count() == 0)
  }
}
