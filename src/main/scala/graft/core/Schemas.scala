package graft.core

import org.apache.spark.sql.types._

/** Explicit StructTypes for the bootcamp warehouse tables (SURVEY §1
  * data model; DDLs under `1-dimensional-data-modeling/`,
  * `2-fact-data-modeling/tables/`, `4-apache-flink-training/sql/`).
  * Declared schemas are the at-scale default: no inference pass, no
  * drift, nullability stated. Postgres types map per SURVEY §1.2
  * (NUMERIC ids → LongType, BIT(32) → LongType bitmask, enums →
  * StringType + validation, JSON bags → StringType, composite types →
  * StructType).
  */
object Schemas {

  /** `2-fact-data-modeling/tables/events.sql:1-8` */
  val webEvents: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("referrer", StringType),
    StructField("user_id", LongType),        // nullable by design
    StructField("device_id", LongType),
    StructField("host", StringType),
    StructField("event_time", TimestampType)))

  /** devices CSV-lite (`3-spark-fundamentals/data/devices.csv:1`) */
  val devices: StructType = StructType(Seq(
    StructField("device_id", LongType, nullable = false),
    StructField("browser_type", StringType),
    StructField("os_type", StringType),
    StructField("device_type", StringType)))

  /** `1-dimensional-data-modeling/sql/player_seasons.sql:1-22` (core) */
  val playerSeasons: StructType = StructType(Seq(
    StructField("player_name", StringType, nullable = false),
    StructField("age", IntegerType),
    StructField("height", StringType),
    StructField("weight", IntegerType),
    StructField("college", StringType),
    StructField("country", StringType),
    StructField("draft_year", StringType),
    StructField("gp", FloatType),
    StructField("pts", FloatType),
    StructField("reb", FloatType),
    StructField("ast", FloatType),
    StructField("season", IntegerType, nullable = false)))

  /** per-season struct (`lecture-lab/players.sql:1-7`) */
  val seasonStats: StructType = StructType(Seq(
    StructField("season", IntegerType),
    StructField("pts", FloatType),
    StructField("ast", FloatType),
    StructField("reb", FloatType),
    StructField("weight", IntegerType)))

  /** cumulative dim (`lecture-lab/players.sql:12-26`) */
  val players: StructType = StructType(Seq(
    StructField("player_name", StringType, nullable = false),
    StructField("height", StringType),
    StructField("college", StringType),
    StructField("country", StringType),
    StructField("draft_year", StringType),
    StructField("seasons", ArrayType(seasonStats)),
    StructField("scoring_class", StringType), // enum {bad,average,good,star}
    StructField("years_since_last_active", IntegerType),
    StructField("is_active", BooleanType),
    StructField("current_season", IntegerType, nullable = false)))

  /** `lecture-lab/players_scd_table.sql:1-9` */
  val playersScd: StructType = StructType(Seq(
    StructField("player_name", StringType, nullable = false),
    StructField("scoring_class", StringType),
    StructField("is_active", BooleanType),
    StructField("start_season", IntegerType),
    StructField("end_season", IntegerType),
    StructField("current_season", IntegerType)))

  /** `1-dimensional-data-modeling/sql/actor_films.sql:1-10` */
  val actorFilms: StructType = StructType(Seq(
    StructField("actor", StringType, nullable = false),
    StructField("actorid", StringType, nullable = false),
    StructField("film", StringType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("votes", IntegerType),
    StructField("rating", FloatType),
    StructField("filmid", StringType, nullable = false)))

  /** `tables/users_cumulated.sql` */
  val usersCumulated: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("dates_active", ArrayType(DateType)),
    StructField("date", DateType, nullable = false)))

  /** `tables/user_datelist_int.sql:1-6` — BIT(32) → long bitmask */
  val userDatelistInt: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("datelist_int", LongType),
    StructField("date", DateType, nullable = false)))

  /** `tables/array_metrics_ddl.sql` */
  val arrayMetrics: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("month_start", DateType, nullable = false),
    StructField("metric_name", StringType, nullable = false),
    StructField("metric_array", ArrayType(FloatType))))

  /** `tables/monthly_user_site_hits.sql` */
  val monthlyUserSiteHits: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("hit_array", ArrayType(LongType)),
    StructField("month_start", DateType),
    StructField("first_found_date", DateType),
    StructField("date_partition", DateType)))

  /** `4-applying-analytical-patterns/tables/user_growth_accounting.sql` */
  val usersGrowthAccounting: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("first_active_date", DateType),
    StructField("last_active_date", DateType),
    StructField("daily_active_state", StringType),
    StructField("weekly_active_state", StringType),
    StructField("dates_active", ArrayType(DateType)),
    StructField("date", DateType, nullable = false)))

  /** `lecture-lab/graph_ddls.sql:7-33` (properties as JSON string) */
  val vertices: StructType = StructType(Seq(
    StructField("identifier", StringType, nullable = false),
    StructField("vertex_type", StringType, nullable = false),
    StructField("properties", StringType)))

  val edges: StructType = StructType(Seq(
    StructField("subject_identifier", StringType, nullable = false),
    StructField("subject_type", StringType, nullable = false),
    StructField("object_identifier", StringType, nullable = false),
    StructField("object_type", StringType, nullable = false),
    StructField("edge_type", StringType, nullable = false),
    StructField("properties", StringType)))

  /** streaming sink (`start_job.py:36-56`) */
  val processedEvents: StructType = StructType(Seq(
    StructField("ip", StringType),
    StructField("event_timestamp", TimestampType),
    StructField("referrer", StringType),
    StructField("host", StringType),
    StructField("url", StringType),
    StructField("geodata", StringType)))

  val all: Map[String, StructType] = Map(
    "web_events" -> webEvents,
    "devices" -> devices,
    "player_seasons" -> playerSeasons,
    "players" -> players,
    "players_scd" -> playersScd,
    "actor_films" -> actorFilms,
    "users_cumulated" -> usersCumulated,
    "user_datelist_int" -> userDatelistInt,
    "array_metrics" -> arrayMetrics,
    "monthly_user_site_hits" -> monthlyUserSiteHits,
    "users_growth_accounting" -> usersGrowthAccounting,
    "vertices" -> vertices,
    "edges" -> edges,
    "processed_events" -> processedEvents)
}
