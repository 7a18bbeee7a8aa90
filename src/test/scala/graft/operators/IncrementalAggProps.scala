package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the mergeable-partials law on random data and random
  * split points — merge(partials(A), partials(B)) ≡ partials(A ∪ B)
  * for every algebraic aggregate the operator handles.
  */
object IncrementalAggProps extends Properties("IncrementalAgg") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val rowsGen: Gen[(List[(String, Long)], Int)] = for {
    rows <- Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b", "c", "d")
      x <- Gen.chooseNum(-1000L, 1000L)
    } yield (k, x))
    split <- Gen.chooseNum(0, rows.length)
  } yield (rows, split)

  private def partials(rows: Seq[(String, Long)]) =
    rows.toDF("k", "x").groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"),
        max($"x").as("mx"), min($"x").as("mn"))

  property("merge(partials(A), partials(B)) == partials(A++B)") =
    forAll(rowsGen) { case (rows, split) =>
      val (a, b) = rows.splitAt(split)
      val merged = IncrementalAgg.mergePartials(
          partials(a), partials(b), Seq("k"),
          sumCols = Seq("n", "s"), maxCols = Seq("mx"),
          minCols = Seq("mn"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val direct = partials(rows)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      merged == direct
    }
}
