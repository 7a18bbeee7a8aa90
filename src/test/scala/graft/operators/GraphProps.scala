package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck invariant for [[Graph.boundedCost]]: the driver
  * Dijkstra and the distributed Bellman-Ford relaxation are
  * INDEPENDENT implementations of the same contract — on random
  * positive-weighted digraphs they must produce identical label
  * maps, and both must agree with a plain in-memory relaxation
  * reference. Random graphs reach the cases fixed fixtures miss
  * (parallel edges with different weights, cycles, seeds inside
  * cycles, budget boundaries landing mid-path).
  */
object GraphProps extends Properties("Graph.boundedCost") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // each case runs a full distributed iterative loop — 15 random
  // graphs exercise the edge cases without a multi-minute suite
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val graphGen: Gen[(List[(Long, Long, Long)], Long)] = for {
    nEdges <- Gen.choose(1, 14)
    edges <- Gen.listOfN(nEdges, for {
      s <- Gen.choose(0L, 5L)
      d <- Gen.choose(0L, 5L)
      w <- Gen.choose(1L, 4L)
    } yield (s, d, w))
    budget <- Gen.choose(2L, 9L)
  } yield (edges, budget)

  private def reference(edges: Seq[(Long, Long, Long)], seed: Long,
      budget: Long): Map[Long, Long] = {
    val dist = scala.collection.mutable.Map(seed -> 0L)
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (s, d, w) =>
        dist.get(s).foreach { c =>
          val nc = c + w
          if (nc <= budget && dist.get(d).forall(nc < _)) {
            dist(d) = nc; changed = true
          }
        }
      }
    }
    dist.toMap
  }

  property("driver Dijkstra ≡ distributed relaxation ≡ reference") =
    forAll(graphGen) { case (edges, budget) =>
      val df = edges.toDF("src", "dst", "w")
      val seeds = Seq(0L).toDF("id")
      val want = reference(edges, 0L, budget)
      Seq(1L << 20, 0L).forall { threshold =>
        Graph.boundedCost(df, seeds, budget,
            localSolveMaxEdges = threshold)
          .as[(Long, Long)].collect().toMap == want
      }
    }
}

/** ScalaCheck law for [[Graph.incrementalComponents]]: on a random
  * edge list with a random old/delta split point, maintaining the old
  * labeling incrementally must equal a full recompute on the union
  * graph — through BOTH the driver union-find and the distributed
  * min-label loop (threshold 0 forces the latter). The split
  * generator hits empty-old (bootstrap), empty-delta (identity
  * update), deltas that bridge several old components, and deltas
  * whose new vertex undercuts an old component's min label.
  */
object IncrementalCcProps
    extends Properties("Graph.incrementalComponents") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val gen: Gen[(List[(Long, Long)], Int)] = for {
    nEdges <- Gen.choose(1, 16)
    edges <- Gen.listOfN(nEdges, for {
      u <- Gen.choose(0L, 9L)
      v <- Gen.choose(0L, 9L)
    } yield (u, v))
    split <- Gen.choose(0, nEdges)
  } yield (edges, split)

  property("incremental update ≡ full recompute on the union graph") =
    forAll(gen) { case (edges, split) =>
      val (old, delta) = edges.splitAt(split)
      def df(e: Seq[(Long, Long)]) = e.toDF("u", "v")
      val full = Graph.connectedComponents(df(edges))
        .as[(Long, Long)].collect().toSet
      Seq(1L << 21, 0L).forall { thr =>
        val ccOld = Graph.connectedComponents(df(old),
          localSolveMaxEdges = thr)
        Graph.incrementalComponents(ccOld, df(delta),
            localSolveMaxEdges = thr)
          .as[(Long, Long)].collect().toSet == full
      }
    }
}

/** ScalaCheck law for [[Graph.retractComponents]]: deleting a random
  * vertex subset from a random labeled graph must equal a full
  * recompute over the surviving edges — through both solve paths.
  * Covers deletes that split a component, wipe one entirely, hit
  * nothing (unknown ids), and the empty delete.
  */
object RetractCcProps extends Properties("Graph.retractComponents") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val gen: Gen[(List[(Long, Long)], List[Long])] = for {
    nEdges <- Gen.choose(1, 16)
    edges <- Gen.listOfN(nEdges, for {
      u <- Gen.choose(0L, 9L)
      v <- Gen.choose(0L, 9L)
    } yield (u, v))
    del <- Gen.listOf(Gen.choose(0L, 11L)) // 10/11 hit nothing
  } yield (edges, del)

  property("retraction ≡ full recompute on the surviving edges") =
    forAll(gen) { case (edges, del) =>
      val delSet = del.toSet
      val surviving = edges.filterNot { case (u, v) =>
        delSet(u) || delSet(v)
      }
      val want = Graph.connectedComponents(surviving.toDF("u", "v"))
        .as[(Long, Long)].collect().toSet
      Seq(1L << 21, 0L).forall { thr =>
        val labels = Graph.connectedComponents(edges.toDF("u", "v"),
          localSolveMaxEdges = thr)
        Graph.retractComponents(labels, edges.toDF("u", "v"),
            del.toDF("id"), localSolveMaxEdges = thr)
          .as[(Long, Long)].collect().toSet == want
      }
    }
}
