package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused `conv(substring(md5(s), 1, h), 16, 10)::BIGINT` — the
  * engine's cross-engine hash (md5 hex prefix as an integer, identical
  * in any engine) computed as one digest plus one shift, instead of
  * digest → 32-char hex encode → substring → base-16 string parse →
  * decimal string → long parse (three string allocations and two
  * parses per value in the composed form). The first h hex chars of a
  * digest are its first 8 bytes read big-endian, shifted right by
  * (64 − 4·h) — exactly the value `conv` parses, bit for bit, so every
  * DuckDB oracle written against the md5-prefix convention is
  * untouched.
  *
  * h ≤ 15 keeps the result inside a non-negative 60-bit long (h = 16
  * would need the sign bit and is rejected).
  */
case class Md5PrefixLong(child: Expression, hexChars: Int)
    extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 15,
    s"hexChars must be 1..15, got $hexChars")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix_long"

  override def nullSafeEval(input: Any): Any =
    Md5PrefixLong.hash(input.asInstanceOf[UTF8String], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("md5PrefixHasher", Md5PrefixLong,
      "graft.plans.Md5PrefixLong$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.hash($c, $hexChars);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Md5PrefixLong = copy(child = newChild)
}

object Md5PrefixLong {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String, hexChars: Int): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    v >>> (64 - 4 * hexChars)
  }

  def apply(s: Column, hexChars: Int = 15): Column =
    Bridge.column(Md5PrefixLong(Bridge.expression(s), hexChars))
}

/** Array form: hash every element of an ARRAY<STRING> in one row-level
  * call — `transform(arr, s -> md5_prefix_long(s))` without the
  * per-element interpreted-lambda dispatch. Used before `explode` so
  * the exploded rows carry 8-byte longs and the digest loop runs
  * fused inside the scan projection. NULL elements stay NULL.
  * CodegenFallback: one call per row does all the per-element work,
  * so row-level dispatch cost is immaterial (the SortedShinglesExpr
  * rationale).
  */
case class Md5PrefixLongs(child: Expression, hexChars: Int)
    extends UnaryExpression with CodegenFallback {
  require(hexChars >= 1 && hexChars <= 15,
    s"hexChars must be 1..15, got $hexChars")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5_prefix_longs expects ARRAY<STRING>, got ${t.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix_longs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = Md5PrefixLong.hash(arr.getUTF8String(i), hexChars)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Md5PrefixLongs = copy(child = newChild)
}

object Md5PrefixLongs {
  def apply(arr: Column, hexChars: Int = 15): Column =
    Bridge.column(Md5PrefixLongs(Bridge.expression(arr), hexChars))
}
