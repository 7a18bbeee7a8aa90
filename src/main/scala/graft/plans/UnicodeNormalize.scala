package graft.plans

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a native codegen'd expression —
  * Spark ships no `normalize` builtin, so a cleaning pipeline that
  * needs NFC before fingerprinting (the same byte sequence can arrive
  * precomposed `é` or decomposed `e`+U+0301 from different crawls, and
  * every downstream hash/dedup/join would treat them as distinct
  * documents) would otherwise reach for a Scala UDF and fall out of
  * whole-stage codegen. `java.text.Normalizer` implements the same
  * Unicode normalization spec as DuckDB's utf8proc-backed
  * `nfc_normalize`, so NFC output is byte-identical cross-engine —
  * the property the oracle pins.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap quick-check scan
  * (ASCII and already-composed text — the overwhelming majority of a
  * real corpus — allocates nothing and returns the input UTF8String
  * as-is); only rows that actually contain denormalized sequences pay
  * the compose/decompose pass.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(UnicodeNormalize.Forms.contains(form),
    s"form must be one of ${UnicodeNormalize.Forms.mkString("/")}, " +
      s"got $form")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects STRING, got " +
        child.dataType.simpleString)

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNormalizer", UnicodeNormalize,
      "graft.plans.UnicodeNormalize$")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $ref.normalize($c, "$form");""")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  private def formOf(form: String): Normalizer.Form = form match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unknown normalization form $other")
  }

  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = formOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def apply(c: Column, form: String = "NFC"): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(c), form))
}
