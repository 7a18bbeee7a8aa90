package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Exact._

/** Core relational surface: scans, filters, hash aggregation (SURVEY
  * §2.2, §2.4). Flagship is `q1_agg`, the TPC-H-Q1-shaped pricing
  * summary — scan → filter (pushed to parquet) → partial+final hash
  * agg. At scale this is a single shuffle on two low-cardinality keys;
  * map-side combine reduces 100 TB of input to a handful of rows per
  * partition before the exchange.
  */
object Relational {

  /** Pricing summary report (reference A1 hash-agg family; cf.
    * `user_cumulated_populate.sql:6-11` GROUP BY shape).
    */
  val q1_agg: Q = Q(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsumRaw(money($"l_extendedprice") * (lit(1) - money($"l_discount")))
          .as("sum_disc_price"),
        davg($"l_quantity").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val all: Seq[Q] = Seq(q1_agg)
}
