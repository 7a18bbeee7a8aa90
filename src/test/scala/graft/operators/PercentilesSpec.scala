package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Distributed rank-selection percentiles ≡ Spark's buffering
  * `percentile` aggregate (which q62's oracle already proves equals
  * DuckDB's quantile_cont).
  */
class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("exactCont equals the percentile aggregate on random groups") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(5000)(
      (s"g${rng.nextInt(4)}", rng.nextInt(100000) / 7.0))
    val df = rows.toDF("grp", "x").repartition(13)
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val got = Percentiles.exactCont(df, "grp", "x", ps)
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
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) =>
      assert(v == expected(k), s"mismatch at $k: $v vs ${expected(k)}")
    }
  }

  test("single-element and two-element groups interpolate correctly") {
    val df = Seq(("a", 10.0), ("b", 1.0), ("b", 3.0)).toDF("grp", "x")
    val got = Percentiles.exactCont(df, "grp", "x", Seq(0.5))
      .select($"grp", $"value").as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 10.0, "b" -> 2.0))
  }

  test("a NULL group key is a real group, like GROUP BY treats it") {
    val df = Seq((Option.empty[String], 1.0), (None, 3.0),
      (Some("a"), 2.0)).toDF("grp", "x")
    val got = Percentiles.exactCont(df, "grp", "x", Seq(0.5))
      .select($"grp", $"value").as[(Option[String], Double)]
      .collect().toMap
    assert(got == Map(Option.empty[String] -> 2.0, Some("a") -> 2.0))
  }

  test("empty input yields an empty result with the right schema") {
    val df = Seq.empty[(String, Double)].toDF("grp", "x")
    val got = Percentiles.exactCont(df, "grp", "x", Seq(0.5))
    assert(got.columns.toSeq == Seq("grp", "p", "value", "n_rows"))
    assert(got.count() == 0)
  }

  test("nulls are excluded, population counts reflect it") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(5.0)))
      .toDF("grp", "x")
    val got = Percentiles.exactCont(df, "grp", "x", Seq(0.5))
      .select($"grp", $"value", $"n_rows")
      .as[(String, Double, Long)].collect()
    assert(got.toSeq == Seq(("a", 3.0, 2L)))
  }

  test("exactDisc equals the percentile_disc aggregate (q137's oracle)") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(3000)(
      (s"g${rng.nextInt(3)}", rng.nextInt(5000) / 3.0))
    val df = rows.toDF("grp", "x").repartition(9)
    df.createOrReplaceTempView("disc_in")
    val ps = Seq(0.01, 0.25, 0.5, 0.75, 1.0)
    val got = Percentiles.exactDisc(df, "grp", "x", ps)
      .select($"grp", $"p", $"value")
      .as[(String, Double, Double)].collect()
      .map { case (g, p, v) => (g, p) -> v }.toMap
    val expected = spark.sql(
      s"""SELECT grp, ${ps.zipWithIndex.map { case (p, i) =>
          s"percentile_disc($p) WITHIN GROUP (ORDER BY x) AS v$i"
        }.mkString(", ")}
         |FROM disc_in GROUP BY grp""".stripMargin)
      .collect()
      .flatMap { r =>
        ps.zipWithIndex.map { case (p, i) =>
          (r.getString(0), p) -> r.getDouble(i + 1)
        }
      }.toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) =>
      assert(v == expected(k), s"mismatch at $k: $v vs ${expected(k)}")
    }
    // disc results must be actual elements of the data
    val vals = rows.map(_._2).toSet
    got.values.foreach(v => assert(vals.contains(v)))
  }

  test("windowed fallback (maxGroups=0) agrees with the offsets path") {
    val rng = new scala.util.Random(23)
    val rows = Seq.fill(4000)(
      (s"g${rng.nextInt(5)}", rng.nextInt(50000) / 11.0))
    val df = rows.toDF("grp", "x").repartition(7)
    val ps = Seq(0.0, 0.1, 0.5, 0.93, 1.0)
    def toMap(res: org.apache.spark.sql.DataFrame) = res
      .select($"grp", $"p", $"value", $"n_rows")
      .as[(String, Double, Double, Long)].collect()
      .map { case (g, p, v, n) => (g, p) -> (v, n) }.toMap
    val offsets = toMap(Percentiles.exactCont(df, "grp", "x", ps))
    val windowed = toMap(
      Percentiles.exactCont(df, "grp", "x", ps, maxGroups = 0L))
    assert(offsets == windowed)
    val offsetsD = toMap(Percentiles.exactDisc(df, "grp", "x", ps))
    val windowedD = toMap(
      Percentiles.exactDisc(df, "grp", "x", ps, maxGroups = 0L))
    assert(offsetsD == windowedD)
  }

  test("group-count guard: 100k+ groups route to the distributed " +
    "windowed plan, no O(partitions x groups) driver state") {
    // 120,001 distinct groups of 1-2 rows — over localSolveMaxGroups,
    // so the default call must take the windowed path and still return
    // one row per (group, p)
    val n = 120001
    val df = spark.range(0, n * 2)
      .selectExpr(s"concat('g', id % $n) AS grp",
        "cast(id as double) / 3.0 AS x")
    val got = Percentiles.exactCont(df, "grp", "x", Seq(0.5))
    assert(n > Percentiles.localSolveMaxGroups)
    assert(got.count() == n.toLong)
    // spot-check one two-row group: g0 holds ids 0 and 120001
    val g0 = got.filter($"grp" === "g0").select($"value")
      .as[Double].head()
    assert(g0 == (0.0 / 3.0 + n.toDouble / 3.0) / 2.0)
  }

  test("exactDisc rank is decimal-exact: p=0.07 over 100 rows " +
    "selects rank 7, not the float-rounded 8") {
    import spark.implicits._
    val df = (1 to 100).map(v => ("g", v.toDouble)).toDF("g", "v")
    val got = Percentiles.exactDisc(df, "g", "v", Seq(0.07))
      .select("value").head().getDouble(0)
    // 0.07*100 in IEEE is 7.000000000000001 — ceil must still be 7
    assert(got == 7.0, s"cume_dist 7/100 >= 0.07 demands rank 7: $got")
    // the windowed plan's expression-side DECIMAL ceiling must agree
    val gotW = Percentiles.exactDisc(df, "g", "v", Seq(0.07),
        maxGroups = 0L)
      .select("value").head().getDouble(0)
    assert(gotW == 7.0, s"windowed path float-rounded the rank: $gotW")
  }
}
