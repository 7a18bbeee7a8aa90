package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** The SCD type-2 maintenance law, as random-case property:
  * `incremental(backfill(hist), today)` ≡ `backfill(hist ∪ today)`.
  *
  * Generator respects the operator's documented contract — per-entity
  * histories are contiguous season ranges, and an entity appearing in
  * `today` is either brand-new or tracked through the previous season
  * (the incremental fold is a per-load maintenance step, not a
  * gap-repair tool). Within that contract everything varies: change
  * patterns, NULL attribute runs (the IS DISTINCT FROM semantics),
  * retirements, and first appearances.
  */
object ScdProps extends Properties("Scd.incremental") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val NewSeason = 2004

  // each case runs three window/join pipelines — 15 random worlds
  // reach all four incremental branches without a multi-minute suite
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val attrGen: Gen[Option[String]] =
    Gen.oneOf(Some("Good"), Some("Bad"), Some("Avg"), None)

  /** (history rows, today rows) for one entity. */
  private def entityGen(name: String)
      : Gen[(List[(String, Int, Option[String])],
             List[(String, Option[String])])] =
    Gen.oneOf("active", "retired", "new", "absent").flatMap {
      case "active" => // tracked through 2003, present today
        for {
          s0 <- Gen.choose(1999, NewSeason - 1)
          attrs <- Gen.listOfN(NewSeason - s0, attrGen)
          t <- attrGen
        } yield (attrs.zipWithIndex.map { case (a, i) => (name, s0 + i, a) },
          List((name, t)))
      case "retired" => // history ends before 2003, absent today
        for {
          s0 <- Gen.choose(1999, NewSeason - 2)
          sEnd <- Gen.choose(s0, NewSeason - 2)
          attrs <- Gen.listOfN(sEnd - s0 + 1, attrGen)
        } yield (attrs.zipWithIndex.map { case (a, i) => (name, s0 + i, a) },
          Nil)
      case "new" => // first seen today
        attrGen.map(t => (Nil, List((name, t))))
      case _ => // tracked through 2003 but missing today (retiring now)
        for {
          s0 <- Gen.choose(1999, NewSeason - 1)
          attrs <- Gen.listOfN(NewSeason - s0, attrGen)
        } yield (attrs.zipWithIndex.map { case (a, i) => (name, s0 + i, a) },
          Nil)
    }

  private val worldGen: Gen[(List[(String, Int, Option[String])],
                             List[(String, Option[String])])] =
    Gen.sequence[List[(List[(String, Int, Option[String])],
                       List[(String, Option[String])])],
                 (List[(String, Int, Option[String])],
                  List[(String, Option[String])])](
      (1 to 6).map(i => entityGen(s"e$i")).toList)
      .map(parts => (parts.flatMap(_._1), parts.flatMap(_._2)))
      .suchThat { case (h, t) => h.nonEmpty && t.nonEmpty }

  property("incremental(backfill(hist), today) == backfill(hist ∪ today)") =
    forAll(worldGen) { case (histRows, todayRows) =>
      val hist = histRows.toDF("player_name", "current_season",
        "scoring_class")
      val today = todayRows.toDF("player_name", "scoring_class")
      val inc = Scd.incremental(
        Scd.backfill(hist, "player_name", "current_season",
          "scoring_class"),
        today, "player_name", "current_season", "scoring_class",
        NewSeason)
      val full = Scd.backfill(
        hist.unionByName(today.selectExpr("player_name",
          s"$NewSeason AS current_season", "scoring_class")),
        "player_name", "current_season", "scoring_class")
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("player_name", "scoring_class", "start_current_season",
          "end_current_season")
        .as[(String, Option[String], Int, Int)].collect().toSet
      val (a, b) = (rows(inc), rows(full))
      val ok = a == b
      if (!ok) println(s"scd law broken: incOnly=${a -- b} fullOnly=${b -- a}")
      ok
    }
}
