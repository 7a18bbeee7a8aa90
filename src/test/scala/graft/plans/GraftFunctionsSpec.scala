package graft.plans

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL") {
    GraftFunctions.register(spark)
    Seq((Seq(1f, 2f), Seq(3f, 4f), Seq("a", "b"), Seq("b", "c")))
      .toDF("va", "vb", "sa", "sb")
      .createOrReplaceTempView("gf")
    val row = spark.sql(
      """SELECT vector_dot(va, vb) AS d,
        |       sorted_intersect_count(sa, sb) AS c,
        |       size(minhash_sig(sa)) AS k
        |FROM gf""".stripMargin).head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getInt(1) == 1)
    assert(row.getInt(2) == 16)
  }
}
