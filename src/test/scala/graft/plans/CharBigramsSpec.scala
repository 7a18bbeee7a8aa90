package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CharBigrams kernel ≡ the composable HOF form
  * `transform(sequence(1, length(t)−1), i -> t.substr(i, 2))`, on the
  * inputs where they could diverge: multi-byte BMP chars (2-3 byte
  * UTF-8), SUPPLEMENTARY chars (4-byte — one code point, two UTF-16
  * units; the case java.lang.String indexing gets wrong), whitespace
  * runs, and the null/short-string edges.
  */
class CharBigramsSpec extends SparkSpec {
  import spark.implicits._

  private val hof =
    transform(sequence(lit(1), length($"t") - 1),
      i => $"t".substr(i, lit(2)))

  test("kernel equals the HOF form on adversarial strings") {
    val fixtures = Seq(
      "ab", "abc", "a b\tc", "中文数据集", "étoile brûlée",
      "mix中ed", "é́combining", // e-acute + combining acute
      "😀ok😁", // emoji (4-byte): 1 code point each
      "  leading", "trailing  ", "\n\r\t", "aa")
    val df = fixtures.toDF("t").filter(length($"t") >= 2)
    val rows = df.select(
        CharBigrams($"t").as("kernel"), hof.as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    rows.zip(fixtures).foreach { case ((k, h), t) =>
      assert(k == h, s"kernel diverged from HOF on <$t>: $k vs $h")
    }
  }

  test("emoji counts as ONE position (UTF8String code points, " +
    "not UTF-16 units)") {
    val bgs = Seq("a😀b").toDF("t")
      .select(CharBigrams($"t")).as[Seq[String]].head()
    assert(bgs == Seq("a😀", "😀b"),
      s"got $bgs")
  }

  test("null propagates, short strings yield empty") {
    val got = Seq(Some("x"), Some(""), None).toDF("t")
      .select(CharBigrams($"t").as("b"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[String](0))
    assert(got(0) == Seq.empty && got(1) == Seq.empty && got(2) == null)
  }
}
