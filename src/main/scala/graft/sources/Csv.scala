package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingest surface (SURVEY §2.1 S1/S2): header + inferSchema reads
  * (the reference's notebook pattern,
  * `event_data_pyspark.ipynb:56-57`), explicit-schema reads (the
  * at-scale default — inference costs an extra full pass over the
  * input), and typed reads into case classes with `Option[_]`
  * nullability (`DatasetApi.ipynb:77-96,185-194`).
  */
object Csv {

  /** Exploratory read: header + type inference (extra pass — fine in a
    * notebook, wrong on 100 TB).
    */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path)

  /** Production read: explicit schema, no inference pass. */
  def read(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Typed read: case-class rows, `Option[_]` fields for nullable
    * columns (S2).
    */
  def readAs[T: Encoder](spark: SparkSession, path: String,
      schema: StructType): Dataset[T] =
    read(spark, path, schema).as[T]
}
