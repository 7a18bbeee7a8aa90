package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Single-pass 60-bit SimHash kernel.
  *
  * Semantics identical to the composable fold (per-token md5 → first
  * 15 hex chars as a 60-bit long; ±1 majority vote per bit; bit set
  * iff votes > 0 — see Dedup.simhashFold), but computed as one digest
  * plus one 60-iteration vote loop per token, zero boxing. The HOF
  * form walks an interpreted 60-wide zip_with lambda per token
  * (~60·|tokens| boxed calls/row). CodegenFallback: the row-level
  * call does all the work, so per-row dispatch cost is irrelevant.
  *
  * A NULL token votes −1 on every bit (the fold's `when` falls
  * through to `otherwise(-1)` on a NULL hash) — preserved exactly.
  * An empty array yields 0L, as the fold's zero-vote state does.
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects ARRAY<STRING>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](60)
    val md = SimHashSig.digest.get()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < 60) { votes(j) -= 1; j += 1 }
      } else {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 15 hex chars == first 8 bytes >>> 4 (60-bit, positive)
        var base = 0L
        var b = 0
        while (b < 8) { base = (base << 8) | (d(b) & 0xffL); b += 1 }
        base = base >>> 4
        var j = 0
        while (j < 60) {
          if (((base >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SimHashSig = copy(child = newChild)
}

object SimHashSig {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def apply(tokens: Column): Column =
    Bridge.column(SimHashSig(Bridge.expression(tokens)))
}
