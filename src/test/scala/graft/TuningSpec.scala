package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.SparkSpec

/** The physical/tuning surface the reference exercises deliberately
  * (SURVEY §2.11 X1–X5): broadcast threshold toggling, cache/unpersist
  * with plan-visible InMemoryRelation, shuffle-partition control.
  */
class TuningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$sfDir/customer.parquet")

  test("X1: autoBroadcastJoinThreshold flips the join strategy") {
    val joined = orders.join(customer, $"o_custkey" === $"c_custkey")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val smj = joined.queryExecution.executedPlan.toString
      assert(smj.contains("SortMergeJoin") && !smj.contains("BroadcastHashJoin"), smj)
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", "10485760")
    val bhj = orders.join(broadcast(customer),
      $"o_custkey" === $"c_custkey").queryExecution.executedPlan.toString
    assert(bhj.contains("BroadcastHashJoin"), bhj)
  }

  test("X3: cache materializes an InMemoryRelation reused downstream") {
    val agg = orders.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"), sum($"o_totalprice").as("v"))
      .persist(StorageLevel.MEMORY_ONLY)
    try {
      agg.count() // materialize
      val consumer1 = agg.filter($"n" > 5)
      val consumer2 = agg.agg(max($"v"))
      assert(consumer1.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"))
      assert(consumer2.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"))
    } finally agg.unpersist()
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    // the 100 TB star-join essential: a selective dim filter prunes
    // fact PARTITIONS at runtime via a DPP subquery — without it the
    // fact side would scan every partition
    spark.sql("DROP TABLE IF EXISTS dpp_fact")
    // a previously failed run can leave the managed location behind
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + "/dpp_fact"), true)
    orders.withColumn("ds", $"o_orderstatus")
      .write.partitionBy("ds").mode("overwrite")
      .saveAsTable("dpp_fact")
    // the dim must be file-backed: a LocalRelation's filter is
    // constant-folded away before the DPP rule looks for a selective
    // predicate on the dim side
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft_dpp_dim").toString
    // NB the filter must be one Catalyst deems "likely selective"
    // (EqualTo/In/…): a bare boolean attribute does not qualify
    Seq(("O", "keep"), ("F", "drop"), ("P", "drop"))
      .toDF("ds", "flag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.table("dpp_fact")
      .join(dim.filter($"flag" === "keep"), Seq("ds"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a DPP subquery in:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS dpp_fact")
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // the row-level sibling of DPP: a bloom filter built from the
    // filtered dim side is pushed into the fact scan, dropping
    // non-joining rows BEFORE the shuffle. Thresholds lowered because
    // the test tables are tiny; at 100 TB the defaults fire on their
    // own.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = customer.filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey")
      val joined = orders.join(dim, $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") ||
        plan.contains("might_contain"),
        s"expected a runtime bloom filter in:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // the runtime complement of Salt.saltedJoin (q98): one hot key
    // carries ~1000× the rows; with skew thresholds scaled to the
    // test data, AQE must mark and split the join after execution.
    // The final plan lives on the SAME QueryExecution that ran — a
    // fresh action (write/count) would re-plan and show no marker.
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(50050).select(
        when($"id" < 50000, "hot")
          .otherwise(concat(lit("k"), $"id")).as("k"),
        $"id".as("v"))
      val right = Seq.tabulate(60)(i =>
        (if (i == 0) "hot" else s"k$i", i)).toDF("k", "w")
      val j = left.join(right.hint("shuffle_hash"), "k")
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE skew split expected in the final adaptive plan:\n$p")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("X2: shuffle.partitions drives post-shuffle parallelism") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val n = orders.groupBy($"o_custkey").count()
        .rdd.getNumPartitions
      assert(n == 3)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("parquet aggregate pushdown (v2) answers MIN/MAX/COUNT from footers") {
    import org.apache.spark.sql.functions._
    // v1 is Spark's default parquet path; the footer-statistics
    // aggregate pushdown lives in DSv2 — flip both confs for the test
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val agged = spark.read.parquet(s"$sfDir/orders.parquet")
        .agg(count(lit(1)).as("n"), min($"o_orderkey").as("mn"),
          max($"o_orderkey").as("mx"))
      assert(agged.queryExecution.executedPlan.toString
          .contains("PushedAggregation: [COUNT(*)"),
        "MIN/MAX/COUNT over plain parquet must come from row-group " +
          "footers, not a scan — at 100 TB that is metadata vs I/O")
      val got = agged.head()
      val want = graft.core.Tables.load(spark, sfDir, "orders")
        .agg(count(lit(1)), min($"o_orderkey"), max($"o_orderkey"))
        .head()
      assert(got == want, s"pushed-down answer must match: $got $want")
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    }
  }

  test("nested schema pruning reads only the projected struct subfield") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_nested").toString
    // a typical event envelope: wide payload struct, narrow probe
    spark.range(100).select($"id",
        struct($"id".as("k"),
          concat(lit("u"), $"id").as("url"),
          lit("x" * 100).as("payload")).as("props"))
      .write.mode("overwrite").parquet(dir)
    val probe = spark.read.parquet(dir).select($"id", $"props.k")
    val scan = probe.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("props:struct<k:bigint>"),
      "projecting props.k must prune url/payload out of the parquet " +
        s"read — at 100 TB the payload column IS the I/O bill: $readSchema")
    assert(probe.agg(sum($"k")).head().getLong(0) == 4950L)
  }
}
