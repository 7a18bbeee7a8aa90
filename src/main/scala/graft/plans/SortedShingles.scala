package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass sorted-distinct shingle kernel — the staging scan the
  * q157 profile showed DOMINATES the set-similarity pipeline (shingle
  * staging 7.6 s vs 1.5 s verify at sf0.1): lowercase once, split
  * once, build each n-token window into one StringBuilder, dedupe
  * through a HashSet, binary-sort the survivors. The composable HOF
  * form ([[graft.functions.TextFunctions.sortedShinglesFold]]) walks
  * interpreted lambdas per window with a fresh slice+join allocation
  * each — this is the same custom-Expression escalation as
  * [[MinHashSig]], and the kernel is property-tested identical to the
  * fold on adversarial whitespace/unicode inputs.
  *
  * Exact-equivalence notes (each pinned by the spec):
  *  - tokenization is `lower(text)` then java-regex `\s+` split with
  *    limit −1 — KEEPING leading/trailing empty tokens, exactly as
  *    Spark's `split` does (and DuckDB's `string_split_regex`);
  *  - NULL text yields an EMPTY array, not NULL — the HOF form's
  *    `when(size(toks) >= n …)` guard sees size(NULL) = NULL and
  *    takes the otherwise branch;
  *  - the sort is UTF8String BINARY order (array_sort's StringType
  *    ordering under UTF8_BINARY), not java.lang.String UTF-16 order.
  *
  * CodegenFallback: one row-level call does all the work, per-row
  * dispatch is noise.
  */
case class SortedShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, s"shingle size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"sorted_shingles expects STRING, got ${t.simpleString}")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sorted_shingles"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val toks = SortedShinglesExpr.Whitespace
      .split(v.asInstanceOf[UTF8String].toLowerCase.toString, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[UTF8String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) out.add(UTF8String.fromString(s))
      i += 1
    }
    val arr = out.toArray(new Array[UTF8String](out.size()))
    java.util.Arrays.sort(arr,
      java.util.Comparator.naturalOrder[UTF8String]())
    new GenericArrayData(arr.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SortedShinglesExpr = copy(child = newChild)
}

object SortedShinglesExpr {
  private val Whitespace: Pattern = Pattern.compile("\\s+")

  def apply(text: Column, n: Int): Column =
    Bridge.column(SortedShinglesExpr(Bridge.expression(text), n))
}
