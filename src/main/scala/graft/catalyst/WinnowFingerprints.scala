package graft.catalyst

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(text, n, w)` — the winnowing (Schleimer–Wilkerson–Aiken)
  * fingerprint set in ONE compiled pass: tokenize on single spaces, hash
  * every ORDERED n-gram (duplicates kept — window contents depend on
  * them) to its 32-bit md5 prefix, take the minimum of each w-hash
  * sliding window, and return the DISTINCT minima in first-occurrence
  * order.
  *
  * Replaces the builtin composition
  * `transform(sequence…, md5(concat_ws(slice…)))` + windowed
  * `array_min(slice…)` whose interpreted per-position lambdas made the
  * winnow index COMPUTE-bound even though it shuffles ~1/w of the full
  * shingle index (ScaleSmoke r16: 71 vs 492 MB shuffled but 20 vs 15 s
  * wall at sf1~ before this expression). Semantics are identical by
  * construction and spec-asserted against the builtin form.
  *
  * Docs with fewer than n+w−1 tokens have no full window and return an
  * EMPTY array (the builtin path's filter, folded into the expression).
  * The sliding minimum is a monotonic deque — O(len), not O(len·w). */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if n >= 1 && w >= 2 => TypeCheckResult.TypeCheckSuccess
      case StringType => TypeCheckResult.TypeCheckFailure(
        s"winnow_fps needs n >= 1 and w >= 2, got n=$n w=$w")
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_fps requires a string column, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any = {
    // trim ' ' only — Spark's trim() semantics (see ShingleHashes)
    val raw = input.asInstanceOf[UTF8String].toString
    var st = 0
    var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val toks = raw.substring(st, en).split(" ", -1)
    if (toks.length < n + w - 1) return new GenericArrayData(new Array[Long](0))
    // raw ORDERED hash stream: one md5 per n-gram position
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder()
    val nHashes = toks.length - n + 1
    val h = new Array[Long](nHashes)
    var i = 0
    while (i < nHashes) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      h(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    // sliding min via monotonic deque (indices, increasing values)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](nHashes)
    var head = 0
    var tail = 0 // [head, tail) live
    i = 0
    while (i < nHashes) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(h(deque(head)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}
