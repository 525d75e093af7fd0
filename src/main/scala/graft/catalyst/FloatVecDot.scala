package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `vec_dot(a, b)` — dot product of two float vectors in double precision,
  * as ONE codegen'd loop.
  *
  * Why a custom Expression (SURVEY §7.3's "only where built-ins can't"):
  * the composable alternatives are either higher-order functions
  * (`aggregate(zip_with(...))` — CodegenFallback, interpreted per element)
  * or an unrolled 64-term `element_at` sum (codegen'd but a giant expression
  * tree that gets re-inlined into every consumer and blows past JIT-friendly
  * method sizes). For a 12.5M-pair brute-force similarity scan both are
  * orders of magnitude slower than this loop.
  *
  * Determinism contract: sequential left-to-right accumulation,
  * `acc += (double)a[i] * (double)b[i]` — float products are exact in double
  * (24+24 ≤ 53 mantissa bits) and the order matches DuckDB's
  * `list_dot_product`, so results are bit-identical across engines (verified
  * empirically in the oracle gate). Interpreted eval uses the identical loop.
  *
  * Nulls: null array → null (nullSafeEval); null ELEMENTS are not supported
  * (embedding columns are dense by contract). Length mismatch → the shorter
  * length wins, matching zip_with's truncation semantics.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}
