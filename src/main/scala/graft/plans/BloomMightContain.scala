package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(key)` as a codegen'd predicate.
  *
  * The serialized filter travels with the plan as plain bytes and is
  * deserialized ONCE per task (lazy val on the deserialized expression
  * instance), then probed per row with two hash multiplications — no
  * per-row deserialization, no UDF boxing. Codegen installs the
  * deserialized filter as a plan reference object, so the probe sits
  * inside whole-stage codegen next to the scan and the false-positive
  * rate is the only cost of pruning before a shuffle.
  *
  * This is the engine-side half of a bloom semi-join
  * ([[graft.operators.BloomJoin]]): Spark's own runtime row-level
  * filtering (`spark.sql.optimizer.runtimeFilter.*`) does the same
  * trick automatically for eligible shuffle joins; this expression
  * makes the pattern explicit, composable, and available where the
  * optimizer's eligibility rules don't reach (e.g. a pre-aggregated
  * dim or a reused filter across queries).
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(bloomBytes)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects BIGINT, got " +
        child.dataType.simpleString)

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  // Array[Byte] equals/hashCode are reference-based, which would make
  // two structurally identical probes compare unequal and defeat
  // expression canonicalization (subexpression elimination, exchange
  // reuse). Compare the serialized filter by VALUE.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child &&
        java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)
}

object BloomMightContain {
  def apply(key: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    Bridge.column(BloomMightContain(Bridge.expression(key), bos.toByteArray))
  }
}
