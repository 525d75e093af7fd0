package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `ws_token_count(text)` — exactly `size(split(trim(text), ' '))` as one
  * compiled byte scan: the whitespace token count the weighted-sample
  * masses (q280/q281) and any "how many tokens" consumer need, WITHOUT
  * materializing the split array (for a 4 KB doc the HOF form allocates
  * ~600 UTF8String slices per row just to read their count).
  *
  * Replay contract (the reason this is bit-exact against the DuckDB
  * oracle's `len(string_split(trim(text), ' '))`): single-space split of
  * the space-trimmed string has `count of 0x20 bytes + 1` segments —
  * consecutive spaces each open a new (empty) segment, and the trimmed
  * empty string still splits to one empty segment (→ 1, never 0). Only
  * ASCII 0x20 is trimmed/split on (both engines' default `trim`/literal
  * `' '` split); a 0x20 byte in UTF-8 is always the space character
  * (multi-byte sequences use bytes ≥ 0x80), so the scan needs no
  * decoding. Null text → null, matching `size(split(NULL))`. */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ws_token_count requires a string column, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "ws_token_count"

  def compute(input: UTF8String): Long = {
    val n = input.numBytes
    var a = 0
    var b = n
    while (a < b && input.getByte(a) == 0x20) a += 1
    while (b > a && input.getByte(b - 1) == 0x20) b -= 1
    var count = 1L
    var i = a
    while (i < b) {
      if (input.getByte(i) == 0x20) count += 1
      i += 1
    }
    count
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wsTokenCount", this,
      classOf[WsTokenCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}
