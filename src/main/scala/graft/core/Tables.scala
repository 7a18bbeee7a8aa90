package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory (e.g.
  * `/root/testdata/sf0.01`) and read one parquet file per table. Reads
  * are plain `spark.read.parquet` so Catalyst keeps filter pushdown,
  * column pruning, and partition-size splitting (at 100 TB the same
  * call reads a multi-file partitioned layout unchanged).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
      // reader rejects outright. Read it as a raw long and truncate to
      // microseconds (TimestampType precision) — same floor-truncation
      // a ns→µs cast performs everywhere else.
      //
      // The conf must be in effect when the parquet footer schema is
      // resolved. All of this repo's entry points (Verify/Bench/
      // Explain/PlanScan/SparkSpec) pin it at session-build time —
      // setting it only here races under concurrent loads on a shared
      // session (another thread's read can resolve the events schema
      // between set and read). The runtime set below is a best-effort
      // fallback for external single-threaded sessions.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Load + round-robin repartition to the session's parallelism.
    *
    * For queries whose cost is per-row compute (minhash, simhash,
    * cosine folds, regex tokenization), not I/O: the local test files
    * are single-row-group parquet, so the scan is one task and the
    * expensive projection would run single-threaded. The repartition
    * is a tiny shuffle (MBs) that unlocks full-width execution. On a
    * real cluster the input arrives as thousands of splits and this
    * becomes a cheap rebalance against skewed file sizes.
    */
  def loadParallel(spark: SparkSession, dir: String, name: String)
      : DataFrame =
    load(spark, dir, name)
      .repartition(spark.sparkContext.defaultParallelism)

  /** Register every table as a temp view (reference pattern S4:
    * `df.createOrReplaceTempView` then SQL — see SURVEY §2.1).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
