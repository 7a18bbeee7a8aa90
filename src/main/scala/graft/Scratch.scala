package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.TextFunctions._
    import graft.operators.Dedup

    val docs = core.Tables.loadParallel(spark, "/root/testdata/sf0.1",
      "documents")

    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[$label run$i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    time("tokens")(docs.select(lowerTokens($"text").as("t")))
    time("shingles")(docs.withColumn("_toks", lowerTokens($"text"))
      .select(shinglesOfTokens($"_toks").as("sh")))
    time("shingles_inline")(docs.select(shingles($"text").as("sh")))
    val sh = docs.withColumn("_toks", lowerTokens($"text"))
      .select(shinglesOfTokens($"_toks").as("sh"))
    time("sig")(sh.select(Dedup.minhashSignature($"sh").as("sig")))
    val sig = sh.select(Dedup.minhashSignature($"sh").as("sig"))
    time("bands")(sig.select(Dedup.lshBandKeys($"sig", 4, 4).as("b")))
    time("bands_explode")(sig.select(
      posexplode(Dedup.lshBandKeys($"sig", 4, 4))))
    time("full")(Dedup.lshBandSummary(docs, "text"))
    println(Dedup.lshBandSummary(docs, "text")
      .queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
