package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Enum/CHECK-constraint emulation (SURVEY §1.1: Postgres enums like
  * `scoring_class ENUM('bad','average','good','star')` and CHECK
  * variants have no Spark analog — the engine uses StringType plus an
  * explicit validation expression at the pipeline boundary).
  */
object Validate {

  /** Pass the value through, failing the job on violations — the
    * strict CHECK-constraint stance for curated warehouse loads.
    */
  def enumStrict(c: Column, allowed: Seq[String]): Column =
    when(c.isNull || c.isin(allowed: _*), c)
      .otherwise(raise_error(concat(
        lit("enum violation: '"), c,
        lit(s"' not in ${allowed.mkString("{", ",", "}")}"))))

  /** Quarantine stance: out-of-domain values become NULL (count them
    * separately and route to a dead-letter table).
    */
  def enumOrNull(c: Column, allowed: Seq[String]): Column =
    when(c.isin(allowed: _*), c)

  /** Violation flag for dead-letter routing / metrics. */
  def enumViolation(c: Column, allowed: Seq[String]): Column =
    c.isNotNull && !c.isin(allowed: _*)
}
