package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The kernel must be bit-identical to the composed
  * conv(substring(md5(s), 1, h), 16, 10)::BIGINT it replaces — that
  * composed form is what every DuckDB oracle mirrors.
  */
class Md5PrefixLongSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq("", "a", "spark", "the quick brown fox",
    "üñïçødé ✓", "0", "a b c d e f g h", "x" * 1000)

  test("scalar kernel ≡ conv(substring(md5)) for h in 1..15") {
    val df = samples.toDF("s")
    Seq(1, 4, 8, 15).foreach { h =>
      val got = df.select(
        Md5PrefixLong($"s", h).as("k"),
        conv(substring(md5($"s"), 1, h), 16, 10).cast("long").as("c"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(0) == r.getLong(1),
          s"h=$h diverged: ${r.getLong(0)} vs ${r.getLong(1)}")
      }
    }
  }

  test("array kernel hashes per element, keeps NULLs, survives empty") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq.empty[String])).toDF("id", "arr")
      .union(Seq((3L, null.asInstanceOf[Seq[String]])).toDF("id", "arr"))
    val got = df.select($"id",
      Md5PrefixLongs($"arr", 15).as("ks"),
      transform($"arr",
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
        .as("cs"))
      .orderBy($"id").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2))
      if (!r.isNullAt(1)) assert(r.getSeq[Long](1) == r.getSeq[Long](2))
    }
    // null ELEMENT stays null in place
    val withNullElem = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b') AS arr")
    val row = withNullElem.select(Md5PrefixLongs(col("arr")).as("ks"))
      .collect()(0).getSeq[Any](0)
    assert(row(1) == null && row(0) != null && row(2) != null)
  }

  test("the scalar kernel compiles into whole-stage codegen") {
    // spark.range (not a literal local relation, which the optimizer
    // pre-evaluates into a LocalTableScan with no codegen stage)
    val p = spark.range(16)
      .select(Md5PrefixLong($"id".cast("string")).as("k"))
      .queryExecution.executedPlan.toString
    // the *(n) prefix marks a whole-stage-codegen'd operator; a
    // CodegenFallback expression would strip it from the Project
    assert(p.contains("*(1) Project [md5_prefix_long"), p)
  }
}
