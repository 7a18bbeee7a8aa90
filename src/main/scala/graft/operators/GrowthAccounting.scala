package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Growth-accounting state machine (reference
  * `4-applying-analytical-patterns/lecture-lab/growth_accounting.sql:19-34`):
  * classify every user-day from first activity onward as
  * new / retained / resurrected / churned / stale.
  *
  * Scale design: instead of the reference's daily self-join of
  * yesterday's table, we aggregate each user's active-day set ONCE
  * (`collect_set` — one shuffle on user_id), then explode the
  * first-day→horizon calendar per user and probe the set with
  * `array_contains`. Per-user state is bounded by the calendar length,
  * the plan has exactly one wide exchange, and no driver loops.
  */
object GrowthAccounting {

  /** Per-(user, day) activity states.
    *
    * @param events  raw events
    * @param userCol user key column name
    * @param tsCol   event-time column name (timestamp)
    * @return (user, day, state) for every day in
    *         [user's first active day, max active day overall]
    */
  def dailyStates(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame =
    states(events, userCol, tsCol,
      active =
        call_function("array_contains", col("days"), col("day")),
      activeYday =
        call_function("array_contains", col("days"),
          date_sub(col("day"), 1)))

  /** Weekly-window variant (the reference table also tracks
    * `weekly_active_state`, `user_growth_accounting.sql:5`): a user is
    * weekly-active on day d if active anywhere in [d−6, d]. Same
    * single-shuffle shape; the window probes are `arrays_overlap`
    * against the per-user day set.
    */
  def weeklyStates(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame =
    states(events, userCol, tsCol,
      active = arrays_overlap(col("days"),
        sequence(date_sub(col("day"), 6), col("day"))),
      activeYday = arrays_overlap(col("days"),
        sequence(date_sub(col("day"), 7), date_sub(col("day"), 1))))

  /** The shared single-shuffle pipeline: per-user day set → horizon
    * cross join → calendar explode → probe-driven state labeling.
    * Only the two activity probes differ between variants.
    */
  private def states(events: DataFrame, userCol: String, tsCol: String,
      active: Column, activeYday: Column): DataFrame = {
    val perUser = events
      .groupBy(col(userCol))
      .agg(collect_set(to_date(col(tsCol))).as("days"))
      .withColumn("first_day", array_min(col("days")))
    val horizon = events
      .agg(max(to_date(col(tsCol))).as("end_day"))
    perUser
      .crossJoin(broadcast(horizon))
      .select(col(userCol),
        explode(sequence(col("first_day"), col("end_day"))).as("day"),
        col("days"), col("first_day"))
      .withColumn("state", stateOf(col("day") === col("first_day"),
        active, activeYday))
      .select(col(userCol), col("day"), col("state"))
  }

  /** The state decision table — exact branch order of
    * `growth_accounting.sql:19-34`.
    */
  def stateOf(isFirst: Column, active: Column, activeYday: Column): Column =
    when(isFirst, "new")
      .when(active && activeYday, "retained")
      .when(active, "resurrected")
      .when(activeYday, "churned")
      .otherwise("stale")
}
