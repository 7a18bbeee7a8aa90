package graft.streaming

import graft.SparkSpec

/** Dormant end-to-end wiring for the real Kafka source/sink (S9/S12).
  *
  * The sandbox has no `spark-sql-kafka-0-10_2.13:4.1.2` (offline
  * coursier, zero egress), so these tests CANCEL — visibly, naming
  * the missing jar — rather than silently pass. The day the
  * environment gains the connector they run as-is: the first proves
  * the documented `readStream.format("kafka")` DDL + the
  * StreamingJobs transform chain composes into a valid streaming
  * plan without a broker (schema resolution and analysis are
  * broker-independent); the second, gated on a live broker via
  * `SPARK_GRAFT_KAFKA_BOOTSTRAP`, starts the query for real.
  * Reference wiring: `4-apache-flink-training/src/job/
  * start_job.py:83-113` (source DDL), `:7-33` (sink).
  */
class KafkaWiringSpec extends SparkSpec {

  private val kafkaJarPresent: Boolean =
    try {
      Class.forName(
        "org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  private val missingMsg =
    "spark-sql-kafka-0-10_2.13:4.1.2 not on the classpath (offline " +
      "coursier cache lacks it; no egress) — drop the jar into " +
      "/opt/spark/jars to activate this test"

  test("kafka source DDL + web-event transform chain analyzes " +
    "without a broker") {
    assume(kafkaJarPresent, missingMsg)
    import org.apache.spark.sql.functions._
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", "localhost:9092")
      .option("subscribe", "web-events")
      .option("startingOffsets", "latest")
      .load()
    assert(raw.isStreaming)
    // the kafka source's fixed schema: key/value binary + metadata
    assert(raw.columns.contains("value") && raw.columns.contains("topic"))
    val parsed = raw.select(
      from_json(col("value").cast("string"),
        StreamingJobs.webEventSchema).as("e"))
      .select("e.*")
    val out = StreamingJobs.processedEvents(parsed)
    // analysis (not execution) proves the DDL+transform wiring: the
    // reference sink schema resolves end-to-end
    assert(out.schema.fieldNames.toSeq == Seq("ip", "event_timestamp",
      "referrer", "host", "url", "geodata"))
  }

  test("kafka round-trip against a live broker") {
    assume(kafkaJarPresent, missingMsg)
    val bootstrap = sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    assume(bootstrap.isDefined,
      "set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port to run the live " +
        "round-trip")
    val q = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap.get)
      .option("subscribe", "web-events")
      .load()
      .writeStream.format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("kafka-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(q.isActive)
    } finally q.stop()
  }
}
