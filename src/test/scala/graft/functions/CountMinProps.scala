package graft.functions

import java.security.MessageDigest

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the count-min grid is a LINEAR sketch — union is
  * element-wise add and retraction element-wise subtract, both EXACT —
  * its point estimates never undercount, the md5-derived row hashes
  * match the relational hex-substring formulation the DuckDB oracle
  * uses, and the Spark aggregator equals a driver-side reference fold
  * under any partitioning.
  */
object CountMinProps extends Properties("CountMin") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val W = 32
  private val itemGen: Gen[String] =
    Gen.oneOf("tok0", "tok1", "tok2", "a", "b", "c", "d", "e", "ff", "g")
  private val itemsGen: Gen[List[String]] = Gen.listOf(itemGen)

  private def refSketch(items: Seq[String]): Array[Long] = {
    val grid = new Array[Long](CountMin.Depth * W)
    items.foreach { it =>
      val h = CountMin.buckets(it, W)
      (0 until CountMin.Depth).foreach(j => grid(j * W + h(j)) += 1L)
    }
    grid
  }

  property("buckets == ('0x'||substr(md5(s),1+8j,8))::BIGINT % width") =
    forAll(Gen.alphaNumStr) { s =>
      val hex = MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val want = (0 until CountMin.Depth).map(j =>
        (java.lang.Long.parseLong(hex.substring(8 * j, 8 * j + 8), 16)
          % W).toInt)
      CountMin.buckets(s, W).toSeq == want
    }

  property("estimate >= true count for every item") =
    forAll(itemsGen) { items =>
      val sk = refSketch(items)
      items.distinct.forall { it =>
        CountMin.estimate(sk, it, W) >=
          items.count(_ == it).toLong
      }
    }

  property("linearity: sketch(A ⊎ B) == merge(sketch(A), sketch(B))") =
    forAll(itemsGen, itemsGen) { (a, b) =>
      val union = refSketch(a ++ b)
      val merged = new CountMinSketch(W)
        .merge(refSketch(a), refSketch(b))
      union.sameElements(merged)
    }

  property("retract(merge(a,b), b) == a exactly") =
    forAll(itemsGen, itemsGen) { (a, b) =>
      val merged = new CountMinSketch(W)
        .merge(refSketch(a), refSketch(b))
      CountMin.retract(merged, refSketch(b)).sameElements(refSketch(a))
    }

  property("innerProduct >= exact join cardinality, == it when " +
      "no buckets collide") =
    forAll(itemsGen, itemsGen) { (a, b) =>
      val est = CountMin.innerProduct(refSketch(a), refSketch(b), W)
      val truth = a.distinct.map(k =>
        a.count(_ == k).toLong * b.count(_ == k)).sum
      est >= truth
    }

  property("aggregator == reference fold under any partitioning") =
    forAll(itemsGen.suchThat(_.nonEmpty)) { items =>
      val got = items.toDF("w").repartition(5)
        .agg(CountMin.sketch(W)($"w")).as[Seq[Long]].head()
      got.toArray.sameElements(refSketch(items))
    }

  property("mergeSketches aggregator == sketch of the concatenation") =
    forAll(Gen.nonEmptyListOf(itemsGen.suchThat(_.nonEmpty))) { parts =>
      val perPart = parts.zipWithIndex.flatMap { case (ws, i) =>
        ws.map(w => (i.toLong, w))
      }.toDF("p", "w").repartition(3)
        .groupBy($"p").agg(CountMin.sketch(W)($"w").as("sk"))
      val got = perPart.agg(CountMin.mergeSketches(W)($"sk"))
        .as[Seq[Long]].head()
      got.toArray.sameElements(refSketch(parts.flatten))
    }
}
