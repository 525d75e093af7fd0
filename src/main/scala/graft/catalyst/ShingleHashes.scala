package graft.catalyst

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text, n)` — tokenize on single spaces, build distinct
  * word n-grams, and hash each to its 32-bit md5 prefix, in ONE pass.
  *
  * Replaces the three-stage builtin pipeline
  * `transform(array_distinct(transform(sequence…, slice…)), md5…)` whose
  * interpreted lambdas dominate MinHash signature cost. Semantics are
  * identical by construction and spec-asserted: `split(trim(text), " ")`
  * tokenization (trailing empties kept, like Spark split with a
  * single-space regex), first-occurrence-ordered distinct, md5 over UTF-8
  * bytes, first 8 hex digits as an unsigned 32-bit value.
  *
  * Docs shorter than n shingle to an EMPTY array (matching the builtin
  * guard), which `minhash_sigs` then maps to null. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case StringType =>
        TypeCheckResult.TypeCheckFailure(s"shingle size must be >= 1, got $n")
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires a string column, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    // trim ' ' ONLY — Java String.trim strips all chars <= U+0020 (tabs,
    // newlines), which would diverge from Spark's trim() (spaces only) that
    // the builtin path and the DuckDB oracle both use.
    val raw = input.asInstanceOf[UTF8String].toString
    var st = 0
    var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val text = raw.substring(st, en)
    val toks = text.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (n == 1) {
      var i = 0
      while (i < toks.length) { seen.add(toks(i)); i += 1 }
    } else if (toks.length >= n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    }
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      md.reset()
      val d = md.digest(it.next().getBytes(StandardCharsets.UTF_8))
      // first 8 hex digits = first 4 bytes as an unsigned 32-bit value
      out(k) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
