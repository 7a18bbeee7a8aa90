package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Upsert emulation (reference S15: Postgres `ON CONFLICT DO UPDATE`,
  * `assignmnet_2.sql:128-137`). Spark has no in-place row update, so
  * the pattern is merge-then-replace:
  *
  *  - key-level upsert into a snapshot table: full-outer join the
  *    existing snapshot with the delta, prefer delta values
  *    ([[mergeUpsert]]);
  *  - partition-level idempotent load: dynamic partition overwrite
  *    replaces exactly the partitions present in the delta
  *    ([[overwritePartitions]]) — the 100 TB-friendly form, since a
  *    daily rerun rewrites one date partition, not the table.
  */
object Upsert {

  /** Keyed upsert: rows from `delta` win over `existing`. */
  def mergeUpsert(existing: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    val valueCols = existing.columns.filterNot(keys.contains)
    Cumulate.fullOuterMerge(existing, delta, keys,
      valueCols.toSeq.map(c =>
        Cumulate.MergeCol(c, coalesce(col(s"t_$c"), col(s"y_$c")))))
  }

  /** Idempotent partition replacement: writes `delta` into `table`,
    * replacing only the partitions the delta contains (requires the
    * table to be partitioned; uses dynamic partitionOverwriteMode).
    */
  def overwritePartitions(spark: SparkSession, delta: DataFrame,
      table: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try delta.write.mode("overwrite").insertInto(table)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
