package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — error bars for corpus statistics
  * (Chamandy et al., "Estimating Uncertainty for Massive Data
  * Streams", Google 2012): resampling n docs WITH replacement is a
  * shuffle-hostile global operation, but each doc's multiplicity in a
  * replicate is ≈ Poisson(1) independently, so R replicate estimates
  * come from ONE corpus pass — per (doc, replicate), a weight drawn
  * from Poisson(1), then R weighted aggregates that all combine
  * map-side.
  *
  * Determinism: the "draw" is `md5(id:rep)` read as the engine's
  * 60-bit prefix integer ([[graft.plans.Md5PrefixLong]] convention),
  * compared against the EXACT integer thresholds
  * ⌊CDF_Poisson(1)(k)·2⁶⁰⌋ for k = 0..5 (weights cap at 6 — the
  * truncated tail carries ~9.5·10⁻⁵ of the mass, far below bootstrap
  * noise). Both engines compare identical integers, so every weight,
  * every replicate sum, and every CI bound reproduces bit-for-bit;
  * the only doubles are single IEEE divisions of exact BIGINT sums
  * (the COVERAGE rule for reproducible doubles — sums must stay
  * below 2⁵³ for the long→double cast to be exact).
  *
  * Scale shape: the corpus is read once, exploded ×R (map-side — no
  * extra shuffle class), and reduced to R replicate rows by one
  * combine; the CI is two order statistics of R driver-side doubles.
  */
object Bootstrap {

  /** ⌊P(Poisson(1) ≤ k)·2⁶⁰⌋ for k = 0..5, exact. */
  val PoissonThresholds: Seq[Long] = Seq(
    424136118829305329L, 848272237658610659L, 1060340297073263324L,
    1131029650211480879L, 1148701988496035267L, 1152236456152946145L)

  /** Poisson(1) weight from a 60-bit uniform: the number of
    * thresholds ≤ u (so u ≥ all six ⇒ weight 6).
    */
  def weight(u: Column): Column =
    PoissonThresholds.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(u >= t, 1L).otherwise(0L)
    }

  /** One row per (input row, replicate) with `rep` and the weight
    * `wgt` — the building block for bootstrapping ANY aggregate.
    */
  def replicated(df: DataFrame, idCol: String, reps: Int): DataFrame = {
    require(reps > 0, s"reps must be positive, got $reps")
    df.withColumn("_reps", lit((0 until reps).toArray))
      .withColumn("rep", explode(col("_reps")))
      .drop("_reps")
      .withColumn("wgt", weight(graft.plans.Md5PrefixLong(
        concat_ws(":", col(idCol).cast("string"),
          col("rep").cast("string")), 15)))
  }

  /** Bootstrap CI for the MEAN of `valueCol`: one row —
    * `n, mean_v, ci_lo, ci_hi` — where the bounds are the
    * `loRank`/`hiRank`-th (1-based, ascending) of the R replicate
    * means. R=40 with ranks 2/39 gives the central 95% band.
    *
    * Null contract: rows with a null `valueCol` are EXCLUDED up
    * front — from `n`, from `mean_v`, and from the resample
    * universe. Without the filter they would skew silently:
    * `count(*)` and `sum(wgt)` would include the row while
    * `sum(wgt·value)` and `sum(value)` skip it, biasing the point
    * estimate and every replicate mean.
    */
  def meanCi(df: DataFrame, idCol: String, valueCol: String,
      reps: Int = 40, loRank: Int = 2, hiRank: Int = 39): DataFrame = {
    require(1 <= loRank && loRank <= hiRank && hiRank <= reps,
      s"need 1 <= loRank <= hiRank <= reps, got $loRank/$hiRank/$reps")
    val spark = df.sparkSession
    import spark.implicits._
    // ONE pass: every replicate group also carries the unweighted
    // count/sum of its (identical) row set, so the point estimate
    // needs no second corpus scan
    val repSums = replicated(df.filter(col(valueCol).isNotNull),
        idCol, reps)
      .groupBy($"rep")
      .agg(sum(col("wgt") * col(valueCol).cast("long")).as("num"),
        sum($"wgt").as("den"),
        count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("long")).as("vs"))
      .as[(Int, Long, Long, Long, Long)].collect() // R rows
    if (repSums.isEmpty)
      return Seq.empty[(Long, Double, Double, Double)]
        .toDF("n", "mean_v", "ci_lo", "ci_hi")
    val (n, s) = (repSums.head._4, repSums.head._5)
    val pointMean = s.toDouble / n
    // a replicate whose every weight drew 0 (probability e⁻ⁿ per
    // replicate) has no sample; pin it to the point estimate rather
    // than letting a NaN sort engine-dependently
    val means = repSums.map { case (_, num, den, _, _) =>
      if (den == 0L) pointMean else num.toDouble / den.toDouble
    }.sorted
    Seq((n, pointMean, means(loRank - 1), means(hiRank - 1)))
      .toDF("n", "mean_v", "ci_lo", "ci_hi")
  }

  /** The Poisson-weight CASE chain for a DuckDB oracle, generated
    * from [[PoissonThresholds]] so the SQL can never drift from the
    * engine's constants.
    */
  def weightSql(uExpr: String): String =
    PoissonThresholds.map(t =>
      s"(CASE WHEN $uExpr >= $t THEN 1 ELSE 0 END)")
      .mkString("\n    + ")
}
