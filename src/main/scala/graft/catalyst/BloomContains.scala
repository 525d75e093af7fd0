package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(str, filterBytes)` — membership probe of a string
  * against a serialized `org.apache.spark.util.sketch.BloomFilter`, as a
  * codegen'd expression.
  *
  * The filter arrives as a BINARY LITERAL and is deserialized ONCE at plan
  * construction (see GraftExtensions) — the same object-through-literal
  * route as the IVF centroid matrix, so the probe itself is one hash +
  * bit-test per row with zero per-row allocation. Used by
  * `Dedup.dedupeAgainstCorpus`: the filter prunes the verifying anti-join
  * to the (tiny) bloom-hit subset; false positives are re-checked there,
  * so the bloom can never change a RESULT, only the cost.
  *
  * Equality is value-based over the serialized bytes so repeated probes of
  * the same filter canonicalize (CSE); the bytes are carried alongside the
  * deserialized object for exactly that purpose. */
case class BloomContains(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a string column, got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  def compute(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContains", this,
      classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override def equals(other: Any): Boolean = other match {
    case o: BloomContains =>
      child == o.child && java.util.Arrays.equals(filterBytes, o.filterBytes)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child,
      Int.box(java.util.Arrays.hashCode(filterBytes)))

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}
