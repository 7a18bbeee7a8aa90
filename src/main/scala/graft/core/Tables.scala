package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      // events.ts has shipped with two physical encodings across
      // testdata generations, so normalize to TimestampType by the
      // dtype Spark actually resolved from the footer:
      //  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ;
      //    cast reinterprets the wall-clock in the session zone (all
      //    entry points pin UTC, making the cast value-identical).
      //  - TIMESTAMP(NANOS) under the legacy nanos-as-long conf
      //    → LongType; floor-truncate ns → µs.
      df.schema("ts").dataType match {
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case _ => df // already TimestampType
      }
    } else df
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
