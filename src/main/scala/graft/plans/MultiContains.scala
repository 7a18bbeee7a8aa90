package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of DISTINCT blocklist patterns contained in a string — the
  * multi-pattern substring scan (Aho–Corasick 1975) a curation
  * pipeline runs for blocklist filtering (UT1-style term lists,
  * boilerplate phrases). The naive plan is N `contains` passes — N
  * full text scans per row, O(N·|text|); this expression walks ONE
  * byte-level automaton over the text, O(|text|) regardless of how
  * many patterns ride in it, with early exit once every pattern has
  * matched.
  *
  * Semantics are exactly `patterns.count(text.contains(_))` — raw
  * substring containment, no token boundaries (the blocklist rule) —
  * so the DuckDB oracle is a plain `contains(text, pat)` cross join.
  * Matching is on UTF-8 BYTES, which for exact substring search is
  * identical to character matching (UTF-8 is self-synchronizing:
  * a byte-aligned match cannot start or end mid-codepoint unless the
  * pattern itself does).
  *
  * The automaton is built ONCE per (executor, expression instance)
  * from the serialized pattern list (`@transient lazy val`), never
  * per row; per-node transitions live in one open-addressed
  * long→int table (key = state·256 + byte) so the walk is allocation-
  * free apart from the per-call seen-bitmap. Patterns are bounded
  * ([[AhoCorasick.MaxTotalBytes]]) because the list is broadcast
  * inside the plan — corpus-scale pattern sets belong in a join, not
  * an expression.
  */
case class MultiContainsCount(child: Expression,
    patterns: Seq[String]) extends UnaryExpression {
  require(patterns.nonEmpty, "multi_contains_count needs >= 1 pattern")
  require(patterns.forall(_.nonEmpty),
    "multi_contains_count: empty pattern matches everything — reject")
  require(patterns.distinct == patterns,
    "multi_contains_count: duplicate patterns (dedup at the caller)")

  @transient private lazy val ac =
    new AhoCorasick(patterns.map(_.getBytes("UTF-8")).toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_contains_count expects STRING, got " +
        s"${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_contains_count"

  override def nullSafeEval(input: Any): Any =
    ac.countDistinct(input.asInstanceOf[UTF8String].getBytes).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val acRef =
      ctx.addReferenceObj("ahoCorasick", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (long) $acRef.countDistinct($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MultiContainsCount = copy(child = newChild)
}

object MultiContainsCount {
  def apply(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiContainsCount(Bridge.expression(text), patterns))
}

/** Per-pattern OCCURRENCE counts in one automaton walk:
  * `array<bigint>` aligned with the pattern list — element i = the
  * number of positions where pattern i matches (OVERLAPPING
  * occurrences: every match end counts, so "aa" occurs twice in
  * "aaa" — exactly `count of j with substr(text, j, len(p)) = p`,
  * the position-scan definition a SQL oracle can replay). The
  * blocklist-attribution form of [[MultiContainsCount]]: which terms
  * fire, and how often, without N passes.
  */
case class MultiContainsCounts(child: Expression,
    patterns: Seq[String]) extends UnaryExpression {
  require(patterns.nonEmpty, "multi_contains_counts needs >= 1 pattern")
  require(patterns.forall(_.nonEmpty),
    "multi_contains_counts: empty pattern matches everywhere — reject")
  require(patterns.distinct == patterns,
    "multi_contains_counts: duplicate patterns (dedup at the caller)")

  @transient private lazy val ac =
    new AhoCorasick(patterns.map(_.getBytes("UTF-8")).toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_contains_counts expects STRING, got " +
        s"${child.dataType.simpleString}")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_contains_counts"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ac.countsPerPattern(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val acRef =
      ctx.addReferenceObj("ahoCorasick", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    $acRef.countsPerPattern($c.getBytes()));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MultiContainsCounts = copy(child = newChild)
}

object MultiContainsCounts {
  def apply(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiContainsCounts(Bridge.expression(text), patterns))
}

/** Byte-level Aho–Corasick automaton with fail links and
  * output-closure. Transitions in one open-addressed long→int table
  * (key = state·256 + byte, power-of-2 capacity, linear probing) —
  * no per-node arrays (a dense int[256] per node is 1 KiB/node) and
  * no boxing on the hot walk.
  */
final class AhoCorasick(patterns: Array[Array[Byte]])
    extends Serializable {
  require(patterns.map(_.length.toLong).sum <= AhoCorasick.MaxTotalBytes,
    s"pattern set exceeds ${AhoCorasick.MaxTotalBytes} total bytes — " +
      "a corpus-scale pattern list belongs in a join, not an expression")

  private val nPatterns = patterns.length
  // trie build: node 0 = root
  private var nNodes = 1
  private val keys = new java.util.HashMap[Long, Integer]()
  private val endsAt = // pattern id -> terminal node
    new Array[Int](nPatterns)
  locally {
    var p = 0
    while (p < nPatterns) {
      var s = 0
      val pat = patterns(p)
      var i = 0
      while (i < pat.length) {
        val k = s.toLong * 256 + (pat(i) & 0xff)
        val nxt = keys.get(k)
        if (nxt == null) { keys.put(k, nNodes); s = nNodes; nNodes += 1 }
        else s = nxt.intValue()
        i += 1
      }
      endsAt(p) = s
      p += 1
    }
  }
  // open-addressed long->int transition table (built after nNodes known)
  private val cap = {
    var c = 16
    while (c < keys.size() * 2) c <<= 1
    c
  }
  private val tKeys = Array.fill[Long](cap)(-1L)
  private val tVals = new Array[Int](cap)
  private def put(k: Long, v: Int): Unit = {
    var i = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L)) & (cap - 1)
    while (tKeys(i) != -1L && tKeys(i) != k) i = (i + 1) & (cap - 1)
    tKeys(i) = k; tVals(i) = v
  }
  private def get(k: Long): Int = {
    var i = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L)) & (cap - 1)
    while (tKeys(i) != -1L) {
      if (tKeys(i) == k) return tVals(i)
      i = (i + 1) & (cap - 1)
    }
    -1
  }
  private val fail = new Array[Int](nNodes)
  // out: per node, the DISTINCT pattern ids matched when the walk is
  // at that node (fail-closure folded in at build time)
  private val out: Array[Array[Int]] = {
    val o = Array.fill(nNodes)(List.empty[Int])
    var p = 0
    while (p < nPatterns) { o(endsAt(p)) ::= p; p += 1 }
    // BFS over the trie to set fail links + closure
    val it = keys.entrySet().iterator()
    val children = Array.fill(nNodes)(List.empty[(Int, Int)]) // (byte, child)
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey
      put(k, e.getValue.intValue())
      children((k / 256).toInt) ::= (((k % 256).toInt, e.getValue.intValue()))
    }
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).foreach { case (_, c) => fail(c) = 0; queue.add(c) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      if (fail(u) != u) o(u) = o(u) ++ o(fail(u))
      children(u).foreach { case (b, c) =>
        var f = fail(u)
        var nxt = get(f.toLong * 256 + b)
        while (nxt == -1 && f != 0) {
          f = fail(f); nxt = get(f.toLong * 256 + b)
        }
        fail(c) = if (nxt == -1 || nxt == c) 0 else nxt
        queue.add(c)
      }
    }
    o.map(_.distinct.toArray)
  }

  /** Per-pattern overlapping occurrence counts (every match end
    * position counts once per pattern) — aligned with the constructor
    * pattern order. No early exit: the full text is walked.
    */
  def countsPerPattern(bytes: Array[Byte]): Array[Long] = {
    val counts = new Array[Long](nPatterns)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      var nxt = get(s.toLong * 256 + b)
      while (nxt == -1 && s != 0) { s = fail(s); nxt = get(s.toLong * 256 + b) }
      s = if (nxt == -1) 0 else nxt
      val hits = out(s)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }

  /** Distinct patterns contained in `bytes`; early exit when all
    * patterns have matched.
    */
  def countDistinct(bytes: Array[Byte]): Int = {
    val seen = new Array[Boolean](nPatterns)
    var nSeen = 0
    var s = 0
    var i = 0
    while (i < bytes.length && nSeen < nPatterns) {
      val b = bytes(i) & 0xff
      var nxt = get(s.toLong * 256 + b)
      while (nxt == -1 && s != 0) { s = fail(s); nxt = get(s.toLong * 256 + b) }
      s = if (nxt == -1) 0 else nxt
      val hits = out(s)
      var j = 0
      while (j < hits.length) {
        if (!seen(hits(j))) { seen(hits(j)) = true; nSeen += 1 }
        j += 1
      }
      i += 1
    }
    nSeen
  }
}

object AhoCorasick {
  /** Pattern-set size bound: the automaton serializes into the plan
    * (broadcast to every task), so cap it well under broadcast-
    * threshold scale. 1 MiB of patterns ≈ a 100k-term blocklist.
    */
  val MaxTotalBytes: Long = 1L << 20
}
