package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck invariants for [[Percentiles]]: on ANY grouped dataset,
  * BOTH routing regimes (driver-offset plan and the distributed
  * windowed-rank fallback) must agree with Spark's buffering
  * `percentile` aggregate — which q62's oracle already proves equals
  * DuckDB's `quantile_cont`. Duplicated values, single-element groups,
  * and boundary percentiles are all generator-reachable.
  */
object PercentilesProps extends Properties("Percentiles.rankSelect") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // each case runs both distributed regimes plus the reference
  // aggregate — 15 random datasets × random percentile sets reach the
  // tie/boundary cases without a multi-minute suite
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  // few groups, duplicate-heavy values (small int range over /4)
  private val rowsGen: Gen[List[(String, Double)]] =
    Gen.choose(1, 200).flatMap(n =>
      Gen.listOfN(n, for {
        g <- Gen.oneOf("g0", "g1", "g2")
        v <- Gen.choose(0, 40)
      } yield (g, v / 4.0)))

  private val psGen: Gen[List[Double]] =
    Gen.someOf(List(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0))
      .map(_.toList).suchThat(_.nonEmpty)

  property("both regimes equal the percentile aggregate") =
    forAll(rowsGen, psGen) { (rows, ps) =>
      val df = rows.toDF("grp", "x").repartition(5)
      def got(maxGroups: Long): Map[(String, Double), Double] =
        Percentiles.exactCont(df, "grp", "x", ps, maxGroups)
          .select($"grp", $"p", $"value")
          .as[(String, Double, Double)].collect()
          .map { case (g, p, v) => (g, p) -> v }.toMap
      val aggCols = ps.map(p => percentile($"x", lit(p)).as(s"p$p"))
      val expected = df.groupBy($"grp")
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
        .flatMap { r =>
          ps.zipWithIndex.map { case (p, i) =>
            (r.getString(0), p) -> r.getDouble(i + 1)
          }
        }.toMap
      got(Long.MaxValue) == expected && got(0L) == expected
    }
}
