package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch (Cormode & Muthukrishnan 2005): a depth×width grid
  * of counters; each item increments one counter per row (row j's
  * bucket from hash j), a point query reads the MINIMUM of its d
  * counters — never an underestimate, over by at most the collision
  * mass (≤ εN with ε = e/width, w.h.p. over hash choice; for the
  * FIXED md5-derived hashes here the overestimate is deterministic
  * and the oracle checks it exactly).
  *
  * Why this completes the sketch family: the engine's other summaries
  * are mergeable but NOT invertible — Misra–Gries trims, HLL ors,
  * t-digest compresses; none can subtract a batch back out. The
  * count-min grid is LINEAR in the input multiset: sketch(A ⊎ B) is
  * the element-wise SUM of sketch(A) and sketch(B), exactly, so
  * retraction is element-wise subtraction and CDC delete batches
  * maintain the sketch with no recompute and no history rescan — the
  * turnstile model. That closes the last cell of the IVM matrix:
  * frequency summaries now support append AND delete, like the exact
  * aggregates (q225/q226) and the dedup graph (q229/q231).
  * CountMinProps pins linearity and retraction as EXACT array
  * equalities, not envelopes.
  *
  * Hashing: the d ≤ 4 row hashes are the four 32-bit big-endian words
  * of one md5 digest, each reduced mod `width` — one digest per item,
  * and bit-for-bit the value any engine gets from
  * `('0x' || substr(md5(item), 1+8j, 8))::BIGINT % width`, so a DuckDB
  * oracle can replay the whole sketch relationally and compare
  * estimates EXACTLY (the md5-prefix convention of
  * [[graft.plans.Md5PrefixLong]], read at four offsets).
  *
  * The aggregator is the scale path: the relational formulation
  * (q87_countmin builds exactly it, same one-digest hash derivation)
  * explodes every token ×depth through a (j, bucket)-keyed shuffle,
  * while the grid — depth·width longs, 16 KB at the 4×512 default —
  * rides partial aggregation map-side and merges by vector add; what
  * the relation can't do at all is subtract a batch back out or dot
  * two sources' grids without re-deriving them.
  */
class CountMinSketch(width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(width > 0, s"width must be positive, got $width")

  override def zero: Array[Long] = new Array[Long](CountMin.Depth * width)

  override def reduce(buf: Array[Long], item: String): Array[Long] = {
    if (item == null) return buf // SQL aggregate semantics: skip nulls
    val h = CountMin.buckets(item, width)
    var j = 0
    while (j < CountMin.Depth) {
      buf(j * width + h(j)) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[Long]]()
}

/** Maintenance-side merge: a column of sketch arrays → their sum (the
  * union sketch, exactly — linearity). Same width contract as the
  * sketches being merged.
  */
class CountMinMerge(width: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  private val inner = new CountMinSketch(width)
  override def zero: Array[Long] = inner.zero
  override def reduce(buf: Array[Long], sk: Seq[Long]): Array[Long] = {
    require(sk.length == buf.length,
      s"sketch length ${sk.length} != ${buf.length} (width mismatch)")
    var i = 0
    while (i < buf.length) { buf(i) += sk(i); i += 1 }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    inner.merge(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
  override def outputEncoder: Encoder[Array[Long]] = inner.outputEncoder
}

object CountMin {
  /** Fixed depth: md5 yields exactly four independent 32-bit words. */
  val Depth = 4
  val DefaultWidth = 512

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Row buckets of `item`: the j-th big-endian 32-bit word of
    * md5(utf8(item)), unsigned, mod `width` — equals
    * `('0x' || substr(md5(item), 1+8j, 8))::BIGINT % width`.
    */
  def buckets(item: String, width: Int): Array[Int] = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(item.getBytes("UTF-8"))
    val out = new Array[Int](Depth)
    var j = 0
    while (j < Depth) {
      val word =
        ((bytes(4 * j) & 0xFFL) << 24) |
        ((bytes(4 * j + 1) & 0xFFL) << 16) |
        ((bytes(4 * j + 2) & 0xFFL) << 8) |
        (bytes(4 * j + 3) & 0xFFL)
      out(j) = (word % width).toInt
      j += 1
    }
    out
  }

  /** Point query: min over the item's d counters. */
  def estimate(sketch: Array[Long], item: String, width: Int): Long = {
    val h = buckets(item, width)
    var best = Long.MaxValue
    var j = 0
    while (j < Depth) {
      val c = sketch(j * width + h(j))
      if (c < best) best = c
      j += 1
    }
    best
  }

  /** Join-size estimate: the count-min INNER PRODUCT
    * (Cormode & Muthukrishnan 2005 §4.3). Row j's Σ_b a_j[b]·b_j[b]
    * equals Σ_keys f_A(k)·f_B(k) — the exact equi-join cardinality —
    * plus non-negative collision cross-terms, so min over rows never
    * underestimates |A ⋈ B| and is within ε·N_A·N_B w.h.p. Two 16 KB
    * grids answer the join-size question without touching either
    * input again — the planner/monitoring use: estimate a join's
    * output before running it, from sketches maintained per source.
    */
  def innerProduct(a: Array[Long], b: Array[Long], width: Int): Long = {
    require(a.length == b.length && a.length == Depth * width,
      s"grid shapes differ: ${a.length} vs ${b.length} vs ${Depth * width}")
    var best = Long.MaxValue
    var j = 0
    while (j < Depth) {
      var s = 0L
      var i = j * width
      while (i < (j + 1) * width) {
        s = Math.addExact(s, Math.multiplyExact(a(i), b(i)))
        i += 1
      }
      if (s < best) best = s
      j += 1
    }
    best
  }

  /** Exact retraction (turnstile delete): the sketch of the remaining
    * multiset, by linearity. Returns a new array.
    */
  def retract(total: Array[Long], removed: Array[Long]): Array[Long] = {
    require(total.length == removed.length,
      s"sketch lengths differ: ${total.length} vs ${removed.length}")
    val out = new Array[Long](total.length)
    var i = 0
    while (i < out.length) {
      out(i) = total(i) - removed(i)
      require(out(i) >= 0L,
        s"retraction drove counter $i below zero — removed batch was " +
          "not a sub-multiset of the sketched input")
      i += 1
    }
    out
  }

  /** `agg`-ready: items → the flattened depth×width counter grid. */
  def sketch(width: Int = DefaultWidth)(item: Column): Column =
    udaf(new CountMinSketch(width), Encoders.STRING).apply(item)

  /** `agg`-ready: sketch arrays → their exact union sketch. */
  def mergeSketches(width: Int = DefaultWidth)(sk: Column): Column =
    udaf(new CountMinMerge(width),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[Long]]()).apply(sk)
}
