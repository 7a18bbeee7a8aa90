package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MathUtils}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Single-pass per-window energy kernel: window w (0-based,
  * hop-spaced, trailing partial included) gets Σ sample² over
  * [w·hop, min(w·hop + windowLen, n)) — exact longs.
  *
  * Semantics identical to the composable HOF form
  * ([[graft.operators.Multimodal.windowEnergiesFold]]:
  * transform(sequence…, slice+aggregate)), property-pinned in
  * WindowEnergiesSpec — but computed in one tight primitive loop per
  * row: the HOF walks ~nWin interpreted slice+fold lambda chains
  * (each sample boxed window/hop ≈ 2.5 times at 40/16), which
  * dominated q304's bench cost. Same escalation rule as
  * [[MinHashSig]]/[[VectorDot]]: the row-level call does all the
  * work, so CodegenFallback's per-row dispatch is irrelevant.
  *
  * Edge semantics: zero samples → EMPTY array (never a fabricated
  * window — the descending-`sequence` guard of the HOF form); null
  * ELEMENTS count as 0 (samples are non-null by construction; the
  * guard keeps the expression total); null INPUT → null. Overflow
  * THROWS via Catalyst's own `MathUtils.multiplyExact`/`addExact` —
  * the SAME factory ANSI `+`/`*` call — so SQL callers of the
  * registered window_energies see the identical error surface
  * (SparkArithmeticException, error class ARITHMETIC_OVERFLOW) as the
  * documented-equivalent Column fold, not a bare
  * java.lang.ArithmeticException (r11 ADVICE).
  */
case class WindowEnergiesExpr(child: Expression, windowLen: Int,
    hop: Int) extends UnaryExpression with CodegenFallback {
  require(windowLen > 0 && hop > 0, "window and hop must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"window_energies expects ARRAY<BIGINT>, got ${t.simpleString}")
    }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "window_energies"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nWin = (n - 1) / hop + 1
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val start = w * hop
      val end = math.min(start + windowLen, n)
      var e = 0L
      var i = start
      while (i < end) {
        if (!arr.isNullAt(i)) {
          val s = arr.getLong(i)
          e = MathUtils.addExact(e, MathUtils.multiplyExact(s, s))
        }
        i += 1
      }
      out(w) = e
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WindowEnergiesExpr = copy(child = newChild)
}

object WindowEnergiesExpr {
  def apply(samples: Column, windowLen: Int, hop: Int): Column =
    Bridge.column(
      WindowEnergiesExpr(Bridge.expression(samples), windowLen, hop))
}
