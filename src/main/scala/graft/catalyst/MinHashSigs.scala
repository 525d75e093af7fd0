package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared universal-hash constants for the MinHash family — the SINGLE
  * source of truth used by both the native expression and the SQL oracles
  * (1000000007·h+0 mod p, 998244353·h+1 mod p, …). aⱼ < 2³⁰ with h < 2³²
  * keeps every product < 2⁶²: no signed overflow in any engine. */
object MinHashFamily {
  val P: Long = 4294967311L // prime > 2^32
  val A: Array[Long] = Array(
    1000000007L, 998244353L, 754974721L, 167772161L,
    469762049L, 595591169L, 645922817L, 897581057L)
  val maxHashes: Int = A.length
}

/** `minhash_sigs(baseHashes, k)` — all k MinHash signature values in ONE
  * pass over the 32-bit base-hash array.
  *
  * Why a custom Expression: the composable form is k separate
  * `array_min(transform(hs, h -> (aⱼ·h+bⱼ) % p))` columns — k interpreted
  * HOF traversals per row, with the lambda expression tree re-interpreted
  * per element. This eval is one compiled Java loop (k·n multiplications);
  * CodegenFallback costs one boxed call per ROW, which is noise next to
  * the per-ELEMENT interpretation it replaces.
  *
  * Returns array<long> of length k; empty/null input → null (callers
  * filter docs with no shingles, same semantics as array_min's null). */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _)
          if numHashes >= 1 && numHashes <= MinHashFamily.maxHashes =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, _) =>
        TypeCheckResult.TypeCheckFailure(
          s"numHashes must be in 1..${MinHashFamily.maxHashes}, got $numHashes")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs requires array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // nullable — an empty shingle set returns null even for a non-null child
  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = (MinHashFamily.A(j) * h + j) % MinHashFamily.P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** `simhash32(baseHashes)` — 32-bit SimHash in one pass: per bit, sum ±1
  * over the token hashes; bit set iff positive. Replaces 32 interpreted
  * aggregate folds per row. Empty/null → null. */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash32 requires array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  // nullable — an empty shingle set returns null even for a non-null child
  override def nullable: Boolean = true

  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val sums = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 32) {
        sums(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
