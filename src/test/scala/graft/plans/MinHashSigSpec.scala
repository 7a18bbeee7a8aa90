package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("kernel is bit-identical to the composable HOF formulation") {
    val rng = new scala.util.Random(3)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val rows = (0 until 200).map(_ =>
      Tuple1(rng.shuffle(vocab).take(1 + rng.nextInt(5))
        .map(w => s"$w ${rng.nextInt(3)} x")))
    val df = rows.toDF("sh")
    val bad = df.filter(
      Dedup.minhashSignature($"sh") =!= Dedup.minhashSignatureFold($"sh"))
    assert(bad.count() == 0)
  }

  test("empty shingle array yields NULL signature") {
    val df = Seq(Tuple1(Seq.empty[String])).toDF("sh")
    assert(df.select(Dedup.minhashSignature($"sh")).head().isNullAt(0))
  }
}
