package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass one-hash MinHash signature kernel.
  *
  * Semantics identical to the composable form (md5 base hash = first
  * 15 hex chars as a 60-bit long; k seed-XOR minima; decimal-string
  * output — see Dedup.minhashSignature), but computed in one tight
  * primitive loop per row: one digest per shingle, a long[k] of
  * running minima, zero boxing. The HOF formulation walks k
  * interpreted lambdas over the shingle array (~k·|shingles| boxed
  * calls/row); this is the custom-Expression escalation the hot sketch
  * path justifies. CodegenFallback: the row-level call does all the
  * work, so per-row dispatch cost is irrelevant.
  *
  * Returns NULL for an empty shingle array (no signature).
  */
case class MinHashSig(child: Expression, seeds: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<STRING>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  @transient private lazy val seedArr: Array[Long] = seeds.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val k = seedArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    val md = MinHashSig.digest.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 15 hex chars == first 8 bytes >>> 4 (60-bit, positive)
        var base = 0L
        var b = 0
        while (b < 8) { base = (base << 8) | (d(b) & 0xffL); b += 1 }
        base = base >>> 4
        var s = 0
        while (s < k) {
          val v = base ^ seedArr(s)
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(l => UTF8String.fromString(l.toString): Any))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)
}

object MinHashSig {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def apply(shingles: Column, seeds: Seq[Long]): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles), seeds))
}
