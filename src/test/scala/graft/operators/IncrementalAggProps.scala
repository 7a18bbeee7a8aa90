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

  // joinDelta law: random two-sided tables with duplicate keys, keys
  // present on one side only, and possibly-empty deltas — the
  // incremental view must equal the full re-join as a MULTISET
  private val joinGen: Gen[(List[(String, Long)], Int,
      List[(String, Long)], Int)] = for {
    as <- Gen.listOf(for {
      k <- Gen.oneOf("a", "b", "c", "d", "e")
      x <- Gen.chooseNum(0L, 99L)
    } yield (k, x))
    sa <- Gen.chooseNum(0, as.length)
    bs <- Gen.listOf(for {
      k <- Gen.oneOf("c", "d", "e", "f", "g")
      y <- Gen.chooseNum(0L, 99L)
    } yield (k, y))
    sb <- Gen.chooseNum(0, bs.length)
  } yield (as, sa, bs, sb)

  property("retract(merge(p(A), p(B)), p(B)) round-trips to p(A)") =
    forAll(rowsGen) { case (rows, split) =>
      val (a, b) = rows.splitAt(split)
      val merged = IncrementalAgg.mergePartials(
        partials(a), partials(b), Seq("k"), sumCols = Seq("n", "s"))
        .select($"k", $"n", $"s")
      val back = IncrementalAgg.retractPartials(
          merged, partials(b).select($"k", $"n", $"s"),
          Seq("k"), sumCols = Seq("n", "s"), countCol = "n")
        .as[(String, Long, Long)].collect().toSet
      val direct = partials(a).select($"k", $"n", $"s")
        .as[(String, Long, Long)].collect().toSet
      back == direct
    }

  property("retractWithRecompute(p(A++D), p(D), A) == p(A)") =
    forAll(rowsGen) { case (rows, split) =>
      val (keep, del) = rows.splitAt(split)
      val remaining = keep.toDF("k", "x")
        .select($"k", $"x".as("mx"), $"x".as("mn"))
      val back = IncrementalAgg.retractWithRecompute(
          partials(rows), partials(del), remaining,
          keys = Seq("k"), sumCols = Seq("n", "s"), countCol = "n",
          maxCols = Seq("mx"), minCols = Seq("mn"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val direct = partials(keep)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      back == direct
    }

  property("joinDelta(V, ΔA, ΔB) == (A++ΔA) join (B++ΔB), multiset") =
    forAll(joinGen) { case (as, sa, bs, sb) =>
      val (aOld, aDelta) = as.splitAt(sa)
      val (bOld, bDelta) = bs.splitAt(sb)
      def dfA(r: Seq[(String, Long)]) = r.toDF("k", "x")
      def dfB(r: Seq[(String, Long)]) = r.toDF("k", "y")
      val view = dfA(aOld).join(dfB(bOld), Seq("k"))
      val inc = IncrementalAgg.joinDelta(view,
          dfA(aOld), dfA(aDelta), dfB(bOld), dfB(bDelta), Seq("k"))
        .as[(String, Long, Long)].collect().toSeq.sorted
      val full = dfA(as).join(dfB(bs), Seq("k"))
        .as[(String, Long, Long)].collect().toSeq.sorted
      inc == full
    }

  // joinRetract law: lineage rids are the row indices, so deletes can
  // hit multi-match keys, rows with no match in the view, and empty
  // batches — the retracted view must equal re-joining the survivors
  property("joinRetract(A⋈B, ΔA, ΔB) == (A−ΔA) join (B−ΔB), multiset") =
    forAll(joinGen) { case (as, sa, bs, sb) =>
      val aRows = as.zipWithIndex.map { case ((k, x), i) => (i.toLong, k, x) }
      val bRows = bs.zipWithIndex.map { case ((k, y), i) => (i.toLong, k, y) }
      val a = aRows.toDF("a_rid", "k", "x")
      val b = bRows.toDF("b_rid", "k", "y")
      val view = a.join(b, Seq("k"))
      val aDel = aRows.take(sa).map(_._1).toDF("a_rid")
      val bDel = bRows.take(sb).map(_._1).toDF("b_rid")
      val inc = IncrementalAgg.joinRetract(view, aDel, "a_rid", bDel, "b_rid")
        .select($"k", $"a_rid", $"x", $"b_rid", $"y")
        .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
      val full = aRows.drop(sa).toDF("a_rid", "k", "x")
        .join(bRows.drop(sb).toDF("b_rid", "k", "y"), Seq("k"))
        .select($"k", $"a_rid", $"x", $"b_rid", $"y")
        .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
      inc == full
    }
}
