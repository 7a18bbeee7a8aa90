package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Set operations (SURVEY §2.7): UNION ALL assembly plus INTERSECT /
  * EXCEPT (unused by the reference but part of the engine surface).
  */
object SetOps {

  /** UNION ALL assembly of labeled aggregates (reference U1/U2:
    * `incremental_scd_query.sql:92-110` 4-way union).
    */
  val q19_union_all: Q = Q(
    "q19_union_all",
    """SELECT 'customer' AS src, COUNT(*) AS n FROM customer
      |UNION ALL SELECT 'supplier' AS src, COUNT(*) AS n FROM supplier
      |UNION ALL SELECT 'part' AS src, COUNT(*) AS n FROM part
      |UNION ALL SELECT 'orders' AS src, COUNT(*) AS n FROM orders
      |ORDER BY src""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    def counted(name: String) =
      Tables.load(spark, dir, name)
        .agg(count(lit(1)).as("n"))
        .select(lit(name).as("src"), $"n")
    counted("customer")
      .unionByName(counted("supplier"))
      .unionByName(counted("part"))
      .unionByName(counted("orders"))
      .orderBy($"src")
  }

  /** INTERSECT: nations having both customers and suppliers. */
  val q19b_intersect: Q = Q(
    "q19b_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val c = Tables.load(spark, dir, "customer")
      .select($"c_nationkey".as("nationkey"))
    val s = Tables.load(spark, dir, "supplier")
      .select($"s_nationkey".as("nationkey"))
    c.intersect(s).orderBy($"nationkey")
  }

  /** EXCEPT: parts never shipped during 1995. */
  val q19c_except: Q = Q(
    "q19c_except",
    """SELECT p_partkey AS partkey FROM part
      |EXCEPT
      |SELECT l_partkey AS partkey FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |ORDER BY partkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val p = Tables.load(spark, dir, "part").select($"p_partkey".as("partkey"))
    val l = Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" < lit("1996-01-01 00:00:00").cast("timestamp"))
      .select($"l_partkey".as("partkey"))
    p.except(l).orderBy($"partkey")
  }

  val all: Seq[Q] = Seq(q19_union_all, q19b_intersect, q19c_except)
}