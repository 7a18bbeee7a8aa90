package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the expression-side next-fit fold ≡ a sequential Scala
  * reference on random item streams (zero-length docs, oversize docs,
  * single-item shards), independent of physical row order.
  */
object PackingProps extends Properties("Packing") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val itemsGen: Gen[(List[Long], Long)] = for {
    cap <- Gen.chooseNum(1L, 20L)
    items <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 30L))
  } yield (items, cap)

  private def ref(items: Seq[Long], cap: Long): Seq[Long] =
    items.foldLeft(Vector.empty[Long]) { (acc, n) =>
      if (acc.nonEmpty && acc.last + n <= cap) acc.init :+ (acc.last + n)
      else acc :+ n
    }

  property("nextFitFills == sequential next-fit fold") =
    forAll(itemsGen) { case (items, cap) =>
      val docs = items.zipWithIndex
        .map { case (n, i) => (0L, i.toLong, n) }
        .toDF("shard", "pos", "n")
        .repartition(4) // physical order must not matter
      val got = Packing.nextFitFills(docs, "shard", "pos", "n", cap)
        .select($"fills").as[Seq[Long]].head()
      got == ref(items, cap)
    }

  property("stats are consistent with the fills they summarize") =
    forAll(itemsGen) { case (items, cap) =>
      val docs = items.zipWithIndex
        .map { case (n, i) => (0L, i.toLong, n) }
        .toDF("shard", "pos", "n")
      val row = Packing.nextFitStats(docs, "shard", "pos", "n", cap)
        .as[(Long, Long, Long, Long, Long, Long, Long)].head()
      val fills = ref(items, cap)
      row == ((0L, items.size.toLong, items.sum, fills.size.toLong,
        fills.filter(_ <= cap).map(cap - _).sum,
        fills.count(_ > cap).toLong,
        fills.zipWithIndex.map { case (f, i) => f * (i + 1) }.sum))
    }
}
