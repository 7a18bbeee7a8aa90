package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck: the Feistel key is a PERMUTATION (exhaustively, over
  * whole small domains — the property that makes it a collision-free
  * shuffle), matches a sequential driver reference bit for bit, is
  * stable under repartitioning, and different salts give different
  * permutations (the seed contract).
  */
object FeistelProps extends Properties("Feistel") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def md5Prefix60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def refKey(id: Long, halfBits: Int, rounds: Int,
      salt: String): Long = {
    val mask = (1L << halfBits) - 1L
    var l = (id >> halfBits) & mask
    var r = id & mask
    (1 to rounds).foreach { rd =>
      val f = md5Prefix60(s"$salt:$rd:$r") % (mask + 1L)
      val nl = r
      val nr = l ^ f
      l = nl
      r = nr
    }
    (l << halfBits) | r
  }

  private val cfgGen: Gen[(Int, Int, String)] = for {
    halfBits <- Gen.chooseNum(1, 4)
    rounds <- Gen.chooseNum(1, 5)
    salt <- Gen.oneOf("graft", "other", "s3")
  } yield (halfBits, rounds, salt)

  property("exhaustive bijection over the full domain == reference") =
    forAll(cfgGen) { case (halfBits, rounds, salt) =>
      val n = 1L << (2 * halfBits)
      val got = spark.range(n).repartition(3)
        .select($"id", Feistel.key($"id", halfBits, rounds, salt)
          .as("k"))
        .as[(Long, Long)].collect().toMap
      val inDomain = got.values.forall(k => k >= 0 && k < n)
      val bijective = got.values.toSet.size == n
      val matches = got.forall { case (id, k) =>
        k == refKey(id, halfBits, rounds, salt) }
      inDomain && bijective && matches
    }

  property("distinct salts give distinct permutations (16-bit halves)") =
    forAll(Gen.chooseNum(0L, (1L << 32) - 33)) { base =>
      // a single point CAN collide; a 33-point stretch must not
      val ids = (base to base + 32L)
      ids.map(refKey(_, 16, 4, "a")) != ids.map(refKey(_, 16, 4, "b"))
    }

  property("spark key at production params == reference") =
    forAll(Gen.listOfN(20, Gen.chooseNum(0L, (1L << 32) - 1))) { ids =>
      val got = ids.distinct.toDF("id").repartition(4)
        .select($"id", Feistel.key($"id").as("k"))
        .as[(Long, Long)].collect().toMap
      got.forall { case (id, k) => k == refKey(id, 16, 4, "graft") }
    }

  property("out-of-domain ids FAIL LOUDLY instead of colliding") =
    forAll(Gen.chooseNum(1, 4), Gen.chooseNum(1L, 1000L)) {
      (halfBits, over) =>
        val bad = (1L << (2 * halfBits)) - 1L + over
        try {
          Seq(bad).toDF("id")
            .select(Feistel.key($"id", halfBits).as("k")).collect()
          false // silent collision — the bug the guard exists to kill
        } catch { case e: Throwable =>
          // the raise_error message must survive Spark's wrapping
          Iterator.iterate[Throwable](e)(_.getCause)
            .takeWhile(_ != null).take(8)
            .exists(t => Option(t.getMessage)
              .exists(_.contains("Feistel.key")))
        }
    }
}
