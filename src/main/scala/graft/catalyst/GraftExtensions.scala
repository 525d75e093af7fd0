package graft.catalyst

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native expressions — the
  * documented plug-in path (`spark.sql.extensions=graft.catalyst.
  * GraftExtensions`), so `vec_dot` is callable from SQL text and
  * `call_function` alike on any session of the cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        FloatVecDot(children.head, children(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "minhash_sigs takes (array<bigint>, numHashes literal)")
        val k = children(1) match {
          case e if e.foldable => e.eval(null).toString.toInt
          case _ => throw new IllegalArgumentException(
            "minhash_sigs numHashes must be a literal")
        }
        MinHashSigs(children.head, k)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash32 takes 1 argument")
        SimHash32(children.head)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("quantize_stats"),
      new ExpressionInfo(classOf[Int8QuantStats].getName, "quantize_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "quantize_stats takes 1 argument")
        Int8QuantStats(children.head)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Text].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash64 takes 1 argument")
        SimHash64Text(children.head)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "shingle_hashes takes (text, shingleSize literal)")
        val n = children(1) match {
          case e if e.foldable => e.eval(null).toString.toInt
          case _ => throw new IllegalArgumentException(
            "shingle_hashes shingleSize must be a literal")
        }
        ShingleHashes(children.head, n)
      }))
  }
}
