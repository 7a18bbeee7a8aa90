package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character bigrams of a string in one byte-walking pass — the
  * staging kernel for the LM-surprisal scorer (q218). The composable
  * form, `transform(sequence(1, length(t)−1), i -> t.substr(i, 2))`,
  * dispatches an interpreted lambda per character and each `substr`
  * call re-walks the string from byte 0 to find its code-point offset
  * (O(n²) per document); this kernel records every code-point boundary
  * once and slices the shared byte array (O(n), zero re-scans) — the
  * same custom-Expression escalation as [[SortedShinglesExpr]].
  *
  * Exact-equivalence notes (pinned by `CharBigramsSpec` against the
  * HOF form):
  *  - positions are CODE POINTS, exactly UTF8String's `substringSQL`
  *    semantics — a 4-byte supplementary char (emoji) is ONE position,
  *    unlike java.lang.String's UTF-16 indexing;
  *  - NULL in → NULL out (the HOF form's sequence/transform chain
  *    null-propagates the same way);
  *  - strings shorter than 2 code points yield an EMPTY array. The
  *    HOF form instead hits the `sequence(1, 0)` DESCENDING-ramp trap
  *    there, so callers guard `length >= 2` before it — with this
  *    kernel the guard is unnecessary but harmless.
  *
  * CodegenFallback: one row-level call does all the per-character
  * work, so row-level dispatch cost is immaterial.
  */
case class CharBigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_bigrams expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_bigrams"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val bytes = v.asInstanceOf[UTF8String].getBytes
    // one pass: record the byte offset of every code-point start
    var n = 0
    var i = 0
    while (i < bytes.length) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      n += 1
    }
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](n + 1)
    i = 0; n = 0
    while (i < bytes.length) {
      offs(n) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      n += 1
    }
    offs(n) = bytes.length
    val out = new Array[AnyRef](n - 1)
    var k = 0
    while (k < n - 1) {
      out(k) = UTF8String.fromBytes(bytes, offs(k), offs(k + 2) - offs(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharBigrams = copy(child = newChild)
}

object CharBigrams {
  def apply(s: Column): Column =
    Bridge.column(CharBigrams(Bridge.expression(s)))
}
