package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.SparkSpec

class BloomMightContainSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bloom: BloomFilter = {
    val bf = BloomFilter.create(1000, 0.01)
    (0L until 1000L).foreach(bf.putLong)
    bf
  }

  test("no false negatives: every inserted key probes true") {
    val misses = (0L until 1000L).toDF("k")
      .filter(!BloomMightContain($"k", bloom))
    assert(misses.count() == 0)
  }

  test("false-positive rate on disjoint keys stays near fpp") {
    val fp = (1000000L until 1010000L).toDF("k")
      .filter(BloomMightContain($"k", bloom))
      .count()
    // 10k disjoint probes at fpp=0.01 ⇒ ~100 expected; 5× headroom
    assert(fp < 500, s"false-positive count $fp out of 10000")
  }

  test("interpreted eval agrees with codegen") {
    val expected = (0L until 20000L).map(k =>
      k -> bloom.mightContainLong(k)).toMap
    val got = (0L until 20000L).toDF("k")
      .select($"k", BloomMightContain($"k", bloom).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    assert(got == expected)
  }

  test("structurally identical probes are semantically equal " +
    "(canonicalization sees filter bytes by value, not reference)") {
    import org.apache.spark.sql.graftbridge.Bridge
    // two independent serializations of the same filter → different
    // Array[Byte] instances; the expression must still compare equal so
    // subexpression elimination and exchange reuse can kick in
    def bytes(bf: BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val (b1, b2) = (bytes(bloom), bytes(bloom))
    assert(b1 ne b2)
    val child = Bridge.expression($"k")
    val e1 = BloomMightContain(child, b1)
    val e2 = BloomMightContain(child, b2)
    assert(e1 == e2, "value-equal probes compared unequal")
    assert(e1.hashCode == e2.hashCode)
    assert(e1.semanticEquals(e2))
    // and a different filter must NOT compare equal
    val other = BloomFilter.create(10, 0.01)
    other.putLong(42L)
    assert(e1 != BloomMightContain(child, bytes(other)))
  }

  test("null keys yield null (nullIntolerant)") {
    val got = Seq(Some(1L), None).toDF("k")
      .select(BloomMightContain($"k", bloom).as("hit"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(got.toSet == Set(Some(true), None))
  }
}
