package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

class SimHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("kernel is bit-identical to the composable HOF formulation") {
    val rng = new scala.util.Random(5)
    val vocab = Seq("the", "quick", "brown", "fox", "data", "spark",
      "über", "naïve", "東京")
    val rows = (0 until 200).map(_ =>
      Tuple1(Seq.fill(1 + rng.nextInt(30))(
        vocab(rng.nextInt(vocab.length))).mkString(" ")))
    val df = rows.toDF("text")
    val bad = df.filter(
      Dedup.simhash($"text") =!= Dedup.simhashFold($"text"))
    assert(bad.count() == 0)
  }

  test("empty token array yields 0, null tokens vote -1 everywhere") {
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(SimHashSig($"toks").as("s")).as[Long].head()
    assert(empty == 0L)
    // a lone null token votes -1 on all 60 bits → still 0
    val nulls = Seq(Tuple1(Seq(null.asInstanceOf[String]))).toDF("toks")
      .select(SimHashSig($"toks").as("s")).as[Long].head()
    assert(nulls == 0L)
    // null votes must cancel positive votes exactly as the fold does
    val mixed = Seq(Tuple1(Seq("a", null.asInstanceOf[String], "a")))
      .toDF("toks")
    val kernel = mixed.select(SimHashSig($"toks")).as[Long].head()
    val hv = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("a".getBytes).take(8)
        .map(b => f"$b%02x").mkString.take(15), 16)
    // votes: bit set in hv → +2-1=+1 → set; bit clear → -3 → clear
    assert(kernel == hv)
  }
}
