package graft.catalyst

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native expressions — the
  * documented plug-in path (`spark.sql.extensions=graft.catalyst.
  * GraftExtensions`), so `vec_dot` is callable from SQL text and
  * `call_function` alike on any session of the cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Evaluate a foldable int argument at plan-construction time. */
  private def litInt(e: Expression, name: String): Int =
    if (e.foldable) e.eval(null).toString.toInt
    else throw new IllegalArgumentException(s"$name must be a literal")

  /** Evaluate a foldable array<array<float>> centroid literal into a flat
    * row-major float matrix — ONE reference object in the plan instead of
    * k×dim literal nodes. */
  private def litCentroids(e: Expression): (Array[Float], Int, Int) = {
    require(e.foldable, "centroids must be a literal array<array<float>>")
    val ad = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val k = ad.numElements()
    require(k >= 1, "centroids must be non-empty")
    val rows = (0 until k).map(i => ad.getArray(i).toFloatArray())
    val dim = rows.head.length
    require(rows.forall(_.length == dim), "centroids must share one dim")
    val flat = new Array[Float](k * dim)
    rows.zipWithIndex.foreach { case (r, i) =>
      System.arraycopy(r, 0, flat, i * dim, dim)
    }
    (flat, k, dim)
  }

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
      new FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "bpe_token_count takes 1 argument")
        BpeTokenCount(children.head)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("weighted_ks"),
      new ExpressionInfo(classOf[WeightedKs].getName, "weighted_ks"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "weighted_ks takes 2 arguments")
        WeightedKs(children.head, children(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("ws_token_count"),
      new ExpressionInfo(classOf[WsTokenCount].getName, "ws_token_count"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "ws_token_count takes 1 argument")
        WsTokenCount(children.head)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "bloom_might_contain takes (str, filter-bytes literal)")
        val bytes = children(1) match {
          case e if e.foldable && e.dataType ==
              org.apache.spark.sql.types.BinaryType =>
            e.eval(null).asInstanceOf[Array[Byte]]
          case _ => throw new IllegalArgumentException(
            "bloom_might_contain filter must be a binary literal")
        }
        BloomContains(children.head, bytes)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("vec_lsh_bucket"),
      new ExpressionInfo(classOf[VecLshBucket].getName, "vec_lsh_bucket"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "vec_lsh_bucket takes (vec, numPlanes literal, dim literal)")
        VecLshBucket(children.head, litInt(children(1), "numPlanes"),
          litInt(children(2), "dim"))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("vec_nearest_centroid"),
      new ExpressionInfo(classOf[VecNearestCentroid].getName, "vec_nearest_centroid"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "vec_nearest_centroid takes (vec, centroids literal)")
        val (flat, k, dim) = litCentroids(children(1))
        VecNearestCentroid(children.head, flat, k, dim)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("vec_top_centroids"),
      new ExpressionInfo(classOf[VecTopCentroids].getName, "vec_top_centroids"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "vec_top_centroids takes (vec, centroids literal, nProbe literal)")
        val (flat, k, dim) = litCentroids(children(1))
        VecTopCentroids(children.head, flat, k, dim,
          litInt(children(2), "nProbe"))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("dup_gram_frac_e6"),
      new ExpressionInfo(classOf[DupGramFracE6].getName, "dup_gram_frac_e6"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "dup_gram_frac_e6 takes (text, n literal)")
        DupGramFracE6(children.head, litInt(children(1), "n"))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("topk_longs"),
      new ExpressionInfo(classOf[TopKLongs].getName, "topk_longs"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "topk_longs takes (integral column, k literal)")
        TopKLongs(children.head, litInt(children(1), "k"))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "kmv_sketch takes (integral column, k literal)")
        KmvSketch(children.head, litInt(children(1), "k"))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("kmv_values"),
      new ExpressionInfo(classOf[KmvValues].getName, "kmv_values"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "kmv_values takes (integral hash column, integral value column, k literal)")
        KmvValues(children(0), children(1), litInt(children(2), "k"))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "nfc_normalize takes 1 argument")
        NfcNormalize(children.head)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fps"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "winnow_fps takes (text, shingleSize literal, window literal)")
        WinnowFingerprints(children.head, litInt(children(1), "shingleSize"),
          litInt(children(2), "window"))
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
