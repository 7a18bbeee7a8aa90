package graft.core

import graft.SparkSpec

/** S4: temp-view registration + SQL over the registered catalog. */
class TablesSpec extends SparkSpec {

  test("registerAll exposes every synthetic table to spark.sql") {
    Tables.registerAll(spark, sfDir)
    Tables.names.foreach { n =>
      assert(spark.catalog.tableExists(n), s"view $n missing")
    }
    val row = spark.sql(
      """SELECT r_name, COUNT(*) AS n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).collect()
    assert(row.length == 5 && row.map(_.getLong(1)).sum > 0)
  }

  test("events view carries the converted microsecond timestamp") {
    Tables.registerAll(spark, sfDir)
    val t = spark.sql("SELECT ts FROM events LIMIT 1").schema.head
    assert(t.dataType.typeName == "timestamp")
  }
}
