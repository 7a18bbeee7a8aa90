package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the two-phase distributed scan equals a sequential
  * `scanLeft` in the declared total order, for any input partitioning
  * and any shuffle width ≥ data size relationships (empty partitions
  * included).
  */
object PrefixSumProps extends Properties("PrefixSum") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 60)
    ids <- Gen.pick(n, 0L until 200L)
    ws <- Gen.listOfN(n, Gen.chooseNum(0L, 50L))
  } yield ids.toList.zip(ws)

  property("exclusive == sequential scanLeft in the total order") =
    forAll(rowsGen) { rows =>
      val df = rows.toDF("id", "w").repartition(7)
      val got = PrefixSum.exclusive(df, Seq("id"), "w", "cum")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val sorted = rows.sortBy(_._1)
      val cums = sorted.map(_._2).scanLeft(0L)(_ + _).init
      val expect = sorted.zip(cums).map { case ((id, w), c) =>
        (id, w, c)
      }
      got.toList == expect
    }
}
