package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Aggregator wiring over real shuffled partitions: the group-level
  * digest, the two-level sketch→merge route, and the single-value
  * edge all land inside the exact rank envelope.
  */
class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private val n = 10000
  private lazy val df = spark.range(0, n)
    .select(($"id" % 4).as("g"),
      // deterministic spread with heavy repetition and outliers
      (($"id" * 2654435761L) % 100000).cast("double").as("v"))
    .repartition(16)

  private def exactRank(vs: Array[Double], q: Double): Double = {
    val s = vs.sorted
    s(math.min(s.length - 1, math.max(0, (q * s.length).toInt)))
  }

  test("group digests estimate quantiles within the rank envelope") {
    val got = df.groupBy($"g")
      .agg(TDigest.quantiles(100, Seq(0.5, 0.95))($"v").as("est"))
      .as[(Long, Seq[Double])].collect().toMap
    val raw = df.as[(Long, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    raw.foreach { case (g, vs) =>
      val Seq(p50, p95) = got(g)
      assert(math.abs(vs.count(_ <= p50).toDouble / vs.length - 0.5)
        <= 0.03, s"g=$g p50")
      assert(math.abs(vs.count(_ <= p95).toDouble / vs.length - 0.95)
        <= 0.03, s"g=$g p95")
    }
  }

  test("two-level sketch -> mergeQuantiles matches a direct digest") {
    // batch by id ranges, digest each, merge the digests
    val merged = df.withColumn("batch", ($"v" % 7).cast("long"))
      .groupBy($"batch")
      .agg(TDigest.sketch(100)($"v").as("sk"))
      .agg(TDigest.mergeQuantiles(100, Seq(0.5, 0.95))($"sk").as("est"))
      .as[Seq[Double]].head()
    val vs = df.select($"v").as[Double].collect()
    val Seq(p50, p95) = merged
    assert(math.abs(vs.count(_ <= p50).toDouble / vs.length - 0.5)
      <= 0.03, "merged p50")
    assert(math.abs(vs.count(_ <= p95).toDouble / vs.length - 0.95)
      <= 0.03, "merged p95")
    assert(math.abs(p50 - exactRank(vs, 0.5)) / 100000.0 <= 0.05)
  }

  test("single-value groups return that value exactly") {
    val got = Seq((1L, 42.5)).toDF("g", "v")
      .groupBy($"g")
      .agg(TDigest.quantiles(100, Seq(0.1, 0.5, 0.9))($"v").as("est"))
      .as[(Long, Seq[Double])].head()
    assert(got._2 == Seq(42.5, 42.5, 42.5))
  }
}
