package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Ports the reference's team-vertex test
  * (`src/tests/test_team_vertex_job.py:10-32`): duplicate entity rows
  * collapse to one vertex (with a total ordering, fixing the
  * reference's nondeterministic ROW_NUMBER), property bag serialized.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("vertex building dedups entities and carries properties") {
    val teams = Seq(
      (1, "GSW", "Warriors", "San Francisco"),
      (1, "GSW", "Bad Warriors", "San Francisco"),
      (2, "LAL", "Lakers", "Los Angeles"))
      .toDF("team_id", "abbreviation", "nickname", "city")
    val deduped = teams
      .withColumn("rn", row_number().over(
        Window.partitionBy($"team_id").orderBy($"nickname")))
      .filter($"rn" === 1).drop("rn")
    val got = Graph.vertices(deduped, $"team_id", "team",
      Seq("abbreviation" -> $"abbreviation", "nickname" -> $"nickname",
        "city" -> $"city"))
    assert(got.count() == 2)
    val gsw = got.filter($"identifier" === "1").head()
    assert(gsw.getString(1) == "team")
    assert(gsw.getString(2) ==
      """{"abbreviation":"GSW","nickname":"Bad Warriors","city":"San Francisco"}""")
  }

  test("triangleCensus counts wedges and closed triangles exactly") {
    // K4 on {1,2,3,4}: every ordered triple a<b<c is a wedge (4) and
    // closes (4 triangles). Pendant edge 4-5 adds wedges a<4<5 for
    // a in {1,2,3} but no triangle.
    val k4 = for {
      u <- 1 to 4; v <- 1 to 4 if u < v
    } yield (u, v)
    val edges = (k4 :+ ((4, 5))).toDF("u", "v")
    val got = Graph.triangleCensus(edges)
      .as[(Long, Long, Long)].head()
    assert(got == ((7L, 7L, 4L)),
      s"expected (n_edges=7, n_wedges=7, n_triangles=4), got $got")
  }

  test("triangleCensus on a triangle-free graph") {
    // path 1-2-3-4: two wedges, zero triangles
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("u", "v")
    val got = Graph.triangleCensus(edges)
      .as[(Long, Long, Long)].head()
    assert(got == ((3L, 2L, 0L)))
  }

  test("coPairs equals the self-join definition, packed and unpacked") {
    // random bipartite membership: the generated pairs must equal the
    // reference self-join on every draw, for both shuffle layouts
    val rng = new scala.util.Random(13)
    val rows = Seq.fill(400)((rng.nextInt(40).toLong, rng.nextInt(25).toLong))
    val df = rows.toDF("grp", "item")
    val expected = rows.distinct
      .groupBy(_._1).values
      .flatMap { g =>
        val items = g.map(_._2).distinct
        for (a <- items; b <- items if a < b) yield (a, b)
      }
      .groupBy(identity).map { case (p, occ) => (p._1, p._2, occ.size.toLong) }
      .toSet
    Seq(false, true).foreach { packed =>
      val got = Graph.coPairs(df, $"grp", $"item", 4, packKey = packed)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"packKey=$packed diverged")
    }
  }

  test("connectedComponents closes chains to the min label (both paths)") {
    // chain 1-2-3 plus pair 5-4 plus triangle 6-7-8 with 8-9 tail;
    // localSolveMaxEdges=0 forces the distributed loop, the default
    // takes the driver union-find shortcut — identical labels required
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 4L),
      (6L, 7L), (7L, 8L), (6L, 8L), (8L, 9L)).toDF("u", "v")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 6L, 8L -> 6L, 9L -> 6L)
    Seq(1L << 20, 0L).foreach { threshold =>
      val got = Graph
        .connectedComponents(edges, localSolveMaxEdges = threshold)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"threshold=$threshold diverged")
    }
  }

  test("empty edge lists yield empty labelings on both CC paths") {
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    Seq(1L << 20, 0L).foreach { threshold =>
      assert(Graph.connectedComponents(empty,
        localSolveMaxEdges = threshold).count() == 0)
    }
    val emptyPr = Seq.empty[(Long, Long)].toDF("src", "dst")
    Seq(1L << 20, 0L).foreach { threshold =>
      assert(Graph.pageRankInt(emptyPr, iters = 2,
        localSolveMaxEdges = threshold).count() == 0)
    }
  }

  test("local and distributed CC agree on a random graph") {
    val rng = new scala.util.Random(99)
    val edges = Seq.fill(300)(
      (rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .toDF("u", "v")
    val local = Graph.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val dist = Graph.connectedComponents(edges, localSolveMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == dist && local.nonEmpty)
  }

  test("pointer doubling closes a deep chain within the default budget") {
    // a 100-vertex path has diameter 99: plain min-label propagation
    // would need ~99 rounds and trip the maxIter=20 guard; pointer
    // doubling closes it in ~log2(99) + warmup rounds
    val edges = (1L until 100L).map(i => (i, i + 1)).toDF("u", "v")
    val got = Graph
      .connectedComponents(edges, localSolveMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 100 && got.values.forall(_ == 1L))
  }

  test("connectedComponents throws rather than returning partial labels") {
    // a 5-chain needs ~4 propagation rounds; maxIter=2 must fail
    // loudly, not silently split the component
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("u", "v")
    val e = intercept[IllegalArgumentException] {
      // force the distributed loop — the local shortcut has no rounds
      Graph.connectedComponents(edges, maxIter = 2,
        localSolveMaxEdges = 0L)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("pageRankInt matches hand-computed fixed-point ranks") {
    // 1→2, 1→3, 2→3, 3→1; scale 1000, damp 85, base 150.
    // iter1: in(1)=1000, in(2)=500, in(3)=1500
    //   → r1 = (1000, 575, 1425)
    // iter2: in(1)=1425, in(2)=500, in(3)=500+575=1075
    //   → r2 = (150+1211, 575, 150+913) = (1361, 575, 1063)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val want = Map(1L -> 1361L, 2L -> 575L, 3L -> 1063L)
    // both the driver fast path and the distributed loop must produce
    // the identical fixed-point ranks
    Seq(1L << 20, 0L).foreach { threshold =>
      val got = Graph.pageRankInt(edges, iters = 2, scale = 1000L,
          localSolveMaxEdges = threshold)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"threshold=$threshold diverged")
    }
  }

  test("pageRankInt: dangling sink keeps receiving, contributes nothing") {
    // 1→2 only: node 2 has no out-edges, its mass drops each round
    // iter1: r = (150, 1000); iter2: r = (150, 150 + 85*150//100=277)
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pageRankInt(edges, iters = 2, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 150L, 2L -> 277L))
  }

  test("boundedHops: min distance wins, cap respected, unreachable absent") {
    // 1→2→3→4→5 plus shortcut 1→4: vertex 4 is 1 hop (shortcut), not 3;
    // vertex 5 is 2; isolated 9→10 unreachable; cap 2 excludes nothing
    // reachable here, cap 1 would
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (9L, 10L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    // threshold 1<<20 takes the driver BFS, 0 the distributed loop —
    // both must produce identical frontier labels
    Seq(1L << 20, 0L).foreach { threshold =>
      val got = Graph.boundedHops(edges, seeds, maxHops = 2,
          localSolveMaxEdges = threshold)
        .as[(Long, Int)].collect().toMap
      assert(got == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2),
        s"threshold=$threshold diverged")
      val capped = Graph.boundedHops(edges, seeds, maxHops = 1,
          localSolveMaxEdges = threshold)
        .as[(Long, Int)].collect().toMap
      assert(capped == Map(1L -> 0, 2L -> 1, 4L -> 1))
    }
  }

  test("boundedHops: multiple seeds take the per-vertex minimum") {
    // seeds 1 and 5 on a path 1→2→3→4→5→6: 4 is hops 2 via 3... but
    // also NOT reached backward from 5 (directed); 6 is 1 from seed 5
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("src", "dst")
    Seq(1L << 20, 0L).foreach { threshold =>
      val got = Graph.boundedHops(edges, Seq(1L, 5L).toDF("id"), 2,
          localSolveMaxEdges = threshold)
        .as[(Long, Int)].collect().toMap
      assert(got == Map(1L -> 0, 5L -> 0, 2L -> 1, 6L -> 1, 3L -> 2))
    }
  }

  test("boundedHops: empty frontier stops early, seeds-only graph") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    Seq(1L << 20, 0L).foreach { threshold =>
      val got = Graph.boundedHops(edges, Seq(7L).toDF("id"), 5,
          localSolveMaxEdges = threshold)
        .as[(Long, Int)].collect().toMap
      assert(got == Map(7L -> 0))
    }
  }

  test("edges carry endpoint types and JSON properties") {
    val df = Seq((10, 20, "AUTomobile")).toDF("c", "n", "seg")
    val got = Graph.edges(df, $"c", "customer", $"n", "nation",
      "located_in", Seq("segment" -> upper($"seg")))
    val row = got.head()
    assert(row.getString(0) == "10" && row.getString(2) == "20")
    assert(row.getString(4) == "located_in")
    assert(row.getString(5) == """{"segment":"AUTOMOBILE"}""")
  }

  test("boundedCost: cheapest path wins over fewest hops; budget " +
    "excludes; both solve paths identical") {
    // 1→2→3 costs 1+1=2, direct 1→3 costs 5 ⇒ min is 2; 1→4 costs 9;
    // 4→5 would be 9+4=13 > budget 12 ⇒ 5 absent; isolated 8→9 absent
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L),
      (1L, 4L, 9L), (4L, 5L, 4L), (8L, 9L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    Seq(1L << 20, 0L).foreach { threshold =>
      val got = Graph.boundedCost(edges, seeds, maxCost = 12L,
          localSolveMaxEdges = threshold)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 9L),
        s"threshold=$threshold diverged: $got")
    }
  }

  test("boundedCost: multi-seed minimum; non-convergence fails loudly") {
    val edges = (1L to 5L).map(i => (i, i + 1, 2L)).toDF("src", "dst", "w")
    Seq(1L << 20, 0L).foreach { threshold =>
      val got = Graph.boundedCost(edges, Seq(1L, 6L).toDF("id"), 6L,
          localSolveMaxEdges = threshold)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 0L, 6L -> 0L, 2L -> 2L, 3L -> 4L,
        4L -> 6L), s"threshold=$threshold diverged: $got")
    }
    // distributed loop must REFUSE to return partial labels when the
    // round budget is too small for the in-budget path depth
    val ex = intercept[IllegalArgumentException] {
      Graph.boundedCost(edges, Seq(1L).toDF("id"), 10L, maxIter = 2,
        localSolveMaxEdges = 0L)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
