package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rng = new scala.util.Random(7)
    (0L until 50L).map(i =>
      (i, Seq.fill(16)(rng.nextGaussian().toFloat))).toDF(
      "vec_id", "embedding")
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f), 1.0),
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 0f), Seq(-1f, 0f), -1.0)).toDF("a", "b", "expected")
    val bad = df.filter(
      abs(Similarity.cosine($"a", $"b") - $"expected") > 1e-9)
    assert(bad.count() == 0)
  }

  test("bruteForceTopK ranks by cosine, excludes self, k rows per query") {
    val queries = vecs.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val cands = vecs.select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val got = Similarity.bruteForceTopK(queries, cands, 4)
    assert(got.count() == 12)
    assert(got.filter($"qid" === $"cid").count() == 0)
    // ranks are dense 1..4 and cosine non-increasing within a query
    val rows = got.orderBy($"qid", $"rank")
      .as[(Long, Int, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).toSeq == Seq(1, 2, 3, 4))
      assert(rs.map(_._4).toSeq.reverse.sorted.reverse == rs.map(_._4).toSeq)
    }
  }

  test("ivfAssign maps every vector to exactly one cell; seeds self-map") {
    val centroids = vecs.filter($"vec_id" < 4)
      .select($"vec_id".as("centroid_id"), $"embedding".as("centroid"))
    val got = Similarity.ivfAssign(vecs, centroids)
    assert(got.count() == 50)
    val seeds = got.filter($"vec_id" < 4)
      .as[(Long, Long, Double)].collect()
    seeds.foreach { case (v, c, cos) =>
      assert(v == c && math.abs(cos - 1.0) < 1e-9)
    }
  }

  test("SRP buckets are deterministic and group identical vectors") {
    val doubled = vecs.unionByName(vecs)
    val h1 = Similarity.srpBucketHistogram(doubled, 8, 16)
      .as[(Long, Long)].collect().toMap
    val h2 = Similarity.srpBucketHistogram(doubled, 8, 16)
      .as[(Long, Long)].collect().toMap
    assert(h1 == h2, "bucketing must be deterministic")
    assert(h1.values.sum == 100)
    assert(h1.values.forall(_ % 2 == 0),
      "identical vectors must land in the same bucket")
  }
}
