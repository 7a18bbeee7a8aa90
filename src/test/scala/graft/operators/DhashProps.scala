package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck for the perceptual-hash near-dup primitives:
  * [[Multimodal.dHash60]] ≡ a sequential gradient-bit reference, and
  * [[Dedup.hashNearDupPairs]] ≡ brute-force all-pairs Hamming — the
  * pigeonhole candidate set must be COMPLETE (maxDist < bands
  * guarantees a matching band) and exact (popcount verify), on
  * clustered signatures that actually produce near-dups.
  */
object DhashProps extends Properties("Dhash") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def refDhash(g: Seq[Long]): Long =
    (0 until 60).map { i =>
      val idx0 = (i / 10) * 11 + (i % 10)
      if (g(idx0 + 1) > g(idx0)) 1L << i else 0L
    }.reduce(_ | _)

  private val genGrids: Gen[List[Seq[Long]]] = for {
    n <- Gen.chooseNum(1, 12)
    gs <- Gen.listOfN(n,
      Gen.listOfN(66, Gen.chooseNum(0L, 255L)).map(x => x: Seq[Long]))
  } yield gs

  property("dHash60 == sequential gradient-bit reference") =
    forAll(genGrids) { grids =>
      val df = grids.zipWithIndex
        .map { case (g, i) => (i.toLong, g) }
        .toDF("id", "gray").repartition(3)
      val got = df.select(col("id"),
          Multimodal.dHash60(col("gray")).as("sig"))
        .as[(Long, Long)].collect().toMap
      grids.zipWithIndex.forall { case (g, i) =>
        got(i.toLong) == refDhash(g)
      }
    }

  // clustered sigs: a base per cluster with 0-4 random bits flipped,
  // so near-dup pairs genuinely occur
  private val genSigs: Gen[List[Long]] = for {
    nClusters <- Gen.chooseNum(1, 3)
    bases <- Gen.listOfN(nClusters,
      Gen.chooseNum(0L, (1L << 60) - 1))
    n <- Gen.chooseNum(2, 14)
    sigs <- Gen.listOfN(n, for {
      b <- Gen.oneOf(bases)
      nf <- Gen.chooseNum(0, 4)
      flips <- Gen.listOfN(nf, Gen.chooseNum(0, 59))
    } yield flips.foldLeft(b)((s, f) => s ^ (1L << f)))
  } yield sigs

  property("hashNearDupPairs == brute-force all-pairs Hamming " +
    "(complete candidates, exact verify)") =
    forAll(genSigs) { sigs =>
      val rows = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = rows.toDF("id", "sig").repartition(3)
      val got = Dedup.hashNearDupPairs(df, maxDist = 3, bands = 4)
        .as[(Long, Long, Int)].collect().toSet
      val want = (for {
        (idA, sigA) <- rows; (idB, sigB) <- rows if idA < idB
      } yield (idA, idB, java.lang.Long.bitCount(sigA ^ sigB)))
        .filter(_._3 <= 3).toSet
      got == want
    }
}
