package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.SparkSpec

/** ScalaCheck: bipartite components ≡ connected components over the
  * materialized "docs sharing ≥1 key" pair graph (the equivalence the
  * pair-free formulation is sold on), ≡ a driver union-find reference,
  * with singleton handling (unshared-key docs keep their own id) and
  * label minimality.
  */
object BipartiteCcProps extends Properties("BipartiteCc") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def refComponents(mem: Seq[(Long, Long)]): Map[Long, Long] = {
    val ids = mem.map(_._1).distinct
    val parent = scala.collection.mutable.Map.empty[Long, Long] ++
      ids.map(i => i -> i)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
        parent(hi) = lo
      }
    }
    mem.groupBy(_._2).values.foreach { rows =>
      val ds = rows.map(_._1)
      ds.tail.foreach(union(ds.head, _))
    }
    ids.map(i => i -> find(i)).toMap
  }

  private val memGen: Gen[List[(Long, Long)]] = for {
    nIds <- Gen.chooseNum(1, 15)
    nKeys <- Gen.chooseNum(1, 10)
    n <- Gen.chooseNum(1, 40)
    mem <- Gen.listOfN(n, for {
      i <- Gen.chooseNum(0L, nIds - 1L)
      k <- Gen.chooseNum(100L, 100L + nKeys - 1)
    } yield (i, k))
  } yield mem.distinct

  property("bipartiteComponents == driver union-find reference") =
    forAll(memGen) { mem =>
      val got = Graph.bipartiteComponents(
          mem.toDF("id", "key").repartition(3))
        .as[(Long, Long)].collect().toMap
      got == refComponents(mem)
    }

  // localSolveMaxRows = 0 forces the distributed loop, so the scale
  // path keeps coverage now that small inputs take the driver
  // union-find fast path
  property("distributed-loop path (localSolveMaxRows = 0) == driver " +
    "union-find reference") =
    forAll(memGen) { mem =>
      val got = Graph.bipartiteComponents(
          mem.toDF("id", "key").repartition(3),
          localSolveMaxRows = 0L)
        .as[(Long, Long)].collect().toMap
      got == refComponents(mem)
    }

  property("== connectedComponents over the shared-key pair graph " +
    "(plus singletons)") =
    forAll(memGen) { mem =>
      val pairs = mem.groupBy(_._2).values.flatMap { rows =>
        val ds = rows.map(_._1).distinct.sorted
        for (a <- ds; b <- ds if a < b) yield (a, b)
      }.toSeq.distinct
      val bip = Graph.bipartiteComponents(mem.toDF("id", "key"))
        .as[(Long, Long)].collect().toMap
      if (pairs.isEmpty)
        bip.forall { case (id, c) => id == c }
      else {
        val cc = Graph.connectedComponents(pairs.toDF("u", "v"))
          .as[(Long, Long)].collect().toMap
        // pair-CC covers exactly the non-singleton ids
        cc.forall { case (id, c) => bip.get(id).contains(c) } &&
          bip.forall { case (id, c) =>
            cc.getOrElse(id, id) == c } // singletons: own id
      }
    }

  property("labels are component minima drawn from the id set") =
    forAll(memGen) { mem =>
      mem.nonEmpty ==> {
        val got = Graph.bipartiteComponents(mem.toDF("id", "key"))
          .as[(Long, Long)].collect().toMap
        val ids = mem.map(_._1).toSet
        got.forall { case (id, c) => c <= id && ids.contains(c) }
      }
    }
}
