package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash64(text)` — 64-bit SimHash straight from the text column in ONE
  * compiled pass: space-tokenize (trim ' ' only, Spark-trim semantics),
  * 64-bit FNV-1a per token, ±1 bit-sums over all 64 bits, bit set iff the
  * sum is positive.
  *
  * Why 64 bits: simhash blocking splits the signature into maxHamming+1
  * bands and bucket-joins on band equality; with 32 bits, any radius past 3
  * leaves bands ≤ 8 bits — too few distinct bucket keys to prune. 64 bits
  * keep bands ≥ 9 bits out to radius 6, so the banded join stays selective
  * at the radii near-dup detection actually uses.
  *
  * Why a custom Expression: the builtin form is a tokenize + transform +
  * 64 interpreted aggregate folds per row; this is one tight loop with zero
  * intermediate arrays. Empty text (no tokens) → null. */
case class SimHash64Text(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires a string column, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  // nullable — blank/whitespace-only text returns null even when the child
  // is non-null; declaring false would let the optimizer drop null guards
  override def nullable: Boolean = true

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    var st = 0
    var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    if (st == en) return null
    val sums = new Array[Int](64)
    var tokStart = st
    var i = st
    var sawToken = false
    while (i <= en) {
      if (i == en || raw.charAt(i) == ' ') {
        // token [tokStart, i): FNV-1a 64 over UTF-16 code units — cheap,
        // deterministic, and avoids a per-token byte[] allocation
        var h = 0xcbf29ce484222325L
        var j = tokStart
        while (j < i) {
          h ^= raw.charAt(j).toLong
          h *= 0x100000001b3L
          j += 1
        }
        sawToken = true
        var b = 0
        while (b < 64) {
          sums(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        tokStart = i + 1
      }
      i += 1
    }
    if (!sawToken) return null
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Text =
    copy(child = newChild)
}
