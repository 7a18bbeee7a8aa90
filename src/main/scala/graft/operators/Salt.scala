package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting. When one key carries a large share
  * of the rows, its single reduce partition becomes the straggler; a
  * salt splits it N ways and a cheap second pass recombines. (AQE's
  * skew-join handles the join case at runtime; explicit salting is
  * the deterministic tool for aggregations and for engines/configs
  * where AQE can't see the skew.)
  */
object Salt {

  /** Deterministic salt in [0, n) derived from a stable column. NULL
    * inputs salt to 0 (crc32(NULL) is NULL, which an inner join on
    * _salt would silently drop).
    */
  def saltCol(from: Column, n: Int): Column =
    coalesce(pmod(crc32(from.cast("string")), lit(n)), lit(0))

  /** Two-phase salted count: groupBy (key, salt) → groupBy key.
    * Identical result to a direct count, but the heavy key's rows
    * spread over n reduce partitions in phase 1.
    */
  def saltedCount(df: DataFrame, key: String, saltFrom: String, n: Int)
      : DataFrame =
    df.withColumn("_salt", saltCol(col(saltFrom), n))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))

  /** Skew-safe join of a skewed fact against a small dimension: the
    * fact gets a random-ish salt, the dimension is exploded n ways so
    * every (key, salt) pair finds its match. Result equals the plain
    * join; the skewed key's rows now land in n tasks.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
      saltFrom: String, n: Int): DataFrame = {
    val s = skewed.withColumn("_salt", saltCol(col(saltFrom), n))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    s.join(d, Seq(key, "_salt")).drop("_salt")
  }
}
