package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("bounded top-k equals the window row_number formulation") {
    val viaAgg = orders
      .groupBy($"o_orderstatus")
      .agg(TopK.topK(3)($"o_totalprice", $"o_orderkey").as("top"))
      .select($"o_orderstatus", explode($"top").as("t"))
      .select($"o_orderstatus", $"t._2".as("o_orderkey"))
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderstatus", $"o_orderkey")
    assertDfEquality(viaAgg, viaWindow)
  }

  test("ties break deterministically by id") {
    val df = Seq(("g", 5.0, 2L), ("g", 5.0, 1L), ("g", 4.0, 3L))
      .toDF("g", "score", "id")
    val got = df.groupBy($"g")
      .agg(TopK.topK(2)($"score", $"id").as("top"))
      .select(transform($"top", t => t.getField("_2")).as("ids"))
      .as[Seq[Long]].head()
    assert(got == Seq(1L, 2L))
  }
}
