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
        |       size(minhash_sig(sa)) AS k,
        |       md5_prefix_long(sa[0]) AS h
        |FROM gf""".stripMargin).head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getInt(1) == 1)
    assert(row.getInt(2) == 16)
    assert(row.getLong(3) ==
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex("a")
          .substring(0, 15), 16))
  }
}
