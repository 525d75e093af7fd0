package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(text)` — Unicode canonical composition (NFC) of a string
  * column, named after DuckDB's identically-specified builtin so the
  * oracle replays it verbatim. Spark exposes no normalization function, and
  * web corpora are full of byte-distinct/codepoint-equivalent variants
  * (e + U+0301 vs é) that defeat exact and canonical dedup alike; NFC is
  * the standard first step (UAX #15 — canonical equivalence, the safe
  * normalization: NFKC's compatibility folding is lossy and stays opt-out).
  * java.text.Normalizer implements the same Unicode normalization spec
  * DuckDB's utf8proc does, and NFC is version-stable for assigned
  * codepoints (normalization stability policy), so the two engines agree
  * codepoint-for-codepoint.
  *
  * Row-local, codegen'd via a bound reference (the Normalizer call
  * dominates; a fast-path skips allocation for strings that are already
  * ASCII, which NFC never changes — the overwhelmingly common case in a
  * mixed corpus). Null → null. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a string column, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  def compute(input: UTF8String): UTF8String = {
    // ASCII is closed under NFC — skip the String round-trip entirely
    if (isAscii(input)) return input
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  private def isAscii(u: UTF8String): Boolean = {
    val n = u.numBytes()
    val b = u.getBytes
    var i = 0
    while (i < n) {
      if ((b(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this,
      classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
