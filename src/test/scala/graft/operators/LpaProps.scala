package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.SparkSpec

/** ScalaCheck: synchronous label propagation ≡ a sequential driver
  * reference (most-frequent neighbor label incl. self, min-label
  * ties, round r reads only round r−1), independent of partitioning —
  * plus the structural laws: an edgeless graph is a fixed point, a
  * clique collapses to its minimum id in one round, and labels are
  * always drawn from the vertex set.
  */
object LpaProps extends Properties("Lpa") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def refLpa(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj: Map[Long, Seq[Long]] = {
      // distinct like the operator: duplicate rows / reversed copies
      // of one undirected edge must not double a label's vote
      val sym = (edges.flatMap { case (u, v) => Seq(u -> v, v -> u) } ++
        nodes.map(v => v -> v)).distinct
      sym.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    }
    var labels = nodes.map(v => v -> v).toMap
    (1 to iters).foreach { _ =>
      labels = nodes.map { v =>
        val counts = adj(v).map(labels).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        // max count, ties -> smallest label
        v -> counts.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }.toMap
    }
    labels
  }

  private val graphGen: Gen[(List[(Long, Long)], Int)] = for {
    nNodes <- Gen.chooseNum(2, 12)
    nEdges <- Gen.chooseNum(1, 20)
    edges <- Gen.listOfN(nEdges, for {
      u <- Gen.chooseNum(0L, nNodes - 1L)
      v <- Gen.chooseNum(0L, nNodes - 1L)
      if u != v
    } yield (math.min(u, v), math.max(u, v)))
    // keep duplicates AND add reversed copies of a prefix: the
    // operator dedups after symmetrizing, so noisy input (repeated
    // rows, both orientations present) must not move any label
    reversed = edges.take(edges.size / 2).map { case (u, v) => (v, u) }
    iters <- Gen.chooseNum(1, 4)
  } yield (edges ++ reversed, iters)

  property("labelPropagation == sequential synchronous reference") =
    forAll(graphGen) { case (edges, iters) =>
      edges.nonEmpty ==> {
        val df = edges.toDF("u", "v").repartition(3)
        val got = Graph.labelPropagation(df, iters)
          .as[(Long, Long)].collect().toMap
        got == refLpa(edges, iters)
      }
    }

  property("a clique collapses to its min id in one round") =
    forAll(Gen.chooseNum(2, 8)) { n =>
      val ids = (0 until n).map(_.toLong)
      val edges = for {
        i <- ids; j <- ids if i < j
      } yield (i, j)
      val got = Graph.labelPropagation(
        edges.toDF("u", "v"), iters = 1).as[(Long, Long)].collect()
      got.forall(_._2 == 0L) && got.length == n
    }

  property("labels always come from the vertex set") =
    forAll(graphGen) { case (edges, iters) =>
      edges.nonEmpty ==> {
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
        val got = Graph.labelPropagation(
          edges.toDF("u", "v"), iters).as[(Long, Long)].collect()
        got.map(_._1).toSet == nodes &&
          got.forall { case (_, l) => nodes.contains(l) }
      }
    }
}
