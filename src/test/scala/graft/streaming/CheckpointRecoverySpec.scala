package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** F7: checkpoint-based recovery. A file-sink query is stopped and
  * restarted against the same checkpoint; already-committed batches
  * must not be re-emitted (exactly-once to the file sink).
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("restart from checkpoint neither loses nor duplicates batches") {
    implicit val ctx = spark.sqlContext
    val base = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ckpt").toString
    val out = s"$base/out"
    val ckpt = s"$base/checkpoint"

    val input = MemoryStream[(Long, String)]
    def start() = input.toDF().toDF("id", "v")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    input.addData(Seq((1L, "a"), (2L, "b")))
    q1.processAllAvailable()
    q1.stop()

    // data queued while "down", then restart against same checkpoint
    input.addData(Seq((3L, "c")))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(out).as[(Long, String)]
      .collect().sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"exactly-once violated: $got")
  }
}
