package graft.catalyst

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Shared derivation of the deterministic random hyperplanes used by the
  * LSH sign-hash (reference: embedding near-dup bucketing,
  * analytics/dedup/embedding_dedupe.py — semantics only, engine is ours).
  *
  * Coefficient for (plane p, dim i) = first 4 md5 hex digits of "p:i"
  * mapped to [-0.5, 0.5) — EXACTLY the Column-composed
  * `conv(substring(md5('p:i'),1,4),16,10)/65536 - 0.5` the builtin fold
  * uses, so native and builtin buckets are bit-identical (spec-asserted).
  * Every executor derives the matrix locally from (numPlanes, dim); no
  * state is shipped.
  */
object HyperPlanes {
  /** Row-major numPlanes×dim coefficient matrix. */
  def planes(numPlanes: Int, dim: Int): Array[Double] = {
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Double](numPlanes * dim)
    var p = 0
    while (p < numPlanes) {
      var i = 0
      while (i < dim) {
        md.reset()
        val h = md.digest(s"$p:$i".getBytes(StandardCharsets.UTF_8))
        // first 4 hex digits == first 2 bytes, as an unsigned 16-bit int
        val u = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
        out(p * dim + i) = u / 65536.0 - 0.5
        i += 1
      }
      p += 1
    }
    out
  }
}

/** `vec_lsh_bucket(vec, numPlanes, dim)` — random-hyperplane sign-hash
  * bucket of a float vector, as one codegen'd loop.
  *
  * Why a custom Expression (SURVEY §7.3): the Column-composed form is a
  * numPlanes×dim `element_at` tree (q39's 4×64 = 256 nodes is fine; at
  * production dims — 768–1536 × 16+ planes — it's tens of thousands of
  * nodes, tripping codegen's 64KB method limit into interpreted fallback
  * and crawling the analyzer). Here the plane matrix is expression state
  * derived once per task; the row cost is one compiled double loop.
  *
  * Semantics mirror the builtin fold exactly, including the edge case:
  * a vector SHORTER than `dim` yields bucket 0 (the builtin's
  * `element_at` nulls every plane sum → every bit 0); extra elements
  * beyond `dim` are ignored. Null vector → null.
  */
case class VecLshBucket(child: Expression, numPlanes: Int, dim: Int)
    extends UnaryExpression {

  @transient private lazy val coefs: Array[Double] =
    HyperPlanes.planes(numPlanes, dim)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _)
          if numPlanes >= 1 && numPlanes <= 63 && dim >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(FloatType, _) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_lsh_bucket needs 1 <= numPlanes <= 63 (got $numPlanes) and dim >= 1 (got $dim)")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_lsh_bucket requires array<float>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "vec_lsh_bucket"

  def compute(vec: ArrayData): Long = {
    if (vec.numElements() < dim) return 0L
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      val base = p * dim
      var i = 0
      while (i < dim) {
        acc += vec.getFloat(i).toDouble * coefs(base + i)
        i += 1
      }
      // NaN sets the bit: Spark SQL orders NaN above every value, so the
      // builtin fold's `d >= 0` is TRUE for a NaN dot — Java's `>=` is
      // false, which would silently bucket NaN-bearing vectors differently
      if (acc >= 0 || java.lang.Double.isNaN(acc)) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecLshBucket", this, classOf[VecLshBucket].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): VecLshBucket =
    copy(child = newChild)
}

/** `vec_nearest_centroid(vec, centroids)` — index of the centroid with the
  * largest dot product (ties → lowest index), i.e. nearest under cosine
  * when centroids are L2-normalized. One codegen'd k×dim loop.
  *
  * Why a custom Expression: the Column-composed form materializes k
  * centroid-literal structs with a vec_dot each — k×dim literal nodes in
  * the plan; at k=1024, dim=1024 the analyzer itself crawls. Here the
  * centroid matrix is a single flat float[] reference object.
  *
  * `centroids` arrives as a foldable array<array<float>> literal and is
  * extracted ONCE at plan construction (see GraftExtensions). Vectors
  * shorter than the centroid dim contribute partial dots (same truncation
  * as vec_dot). Null vector → null; empty centroid list is rejected.
  */
case class VecNearestCentroid(child: Expression, cents: Array[Float],
    k: Int, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) if k >= 1 && dim >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(FloatType, _) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_nearest_centroid needs k >= 1 and dim >= 1 (got k=$k dim=$dim)")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_nearest_centroid requires array<float>, got ${other.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "vec_nearest_centroid"

  def compute(vec: ArrayData): Int = {
    var bestD = Double.PositiveInfinity // minimizing -dot
    var bestC = 0
    var c = 0
    while (c < k) {
      val n = math.min(dim, vec.numElements())
      val base = c * dim
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += vec.getFloat(i).toDouble * cents(base + i).toDouble
        i += 1
      }
      val d = -acc
      // total order (NaN greatest, -0.0 < 0.0) — the ordering Spark's own
      // array_min/array_sort use, so a ±0.0 or NaN dot buckets identically
      // native and builtin
      if (java.lang.Double.compare(d, bestD) < 0) { bestD = d; bestC = c }
      c += 1
    }
    bestC
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecNearestCentroid", this,
      classOf[VecNearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  // value-based equality over the Array[Float] field: the case-class default
  // compares the array by reference, so two semantically identical instances
  // would never be `semanticEquals` — defeating expression canonicalization
  // and common-subexpression elimination when ivfBucket is reused in a plan
  override def equals(other: Any): Boolean = other match {
    case o: VecNearestCentroid =>
      child == o.child && k == o.k && dim == o.dim &&
        java.util.Arrays.equals(cents, o.cents)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Int.box(k), Int.box(dim),
      Int.box(java.util.Arrays.hashCode(cents)))

  override protected def withNewChildInternal(newChild: Expression): VecNearestCentroid =
    copy(child = newChild)
}

/** `vec_top_centroids(vec, centroids, nProbe)` — the `nProbe` centroid
  * indices nearest to `vec` (descending dot product, ties → lower index
  * first), for multi-probe IVF queries. Replaces the Column-composed
  * `slice(array_sort(k centroid structs), 1, nProbe)` whose plan carries
  * k×dim literal nodes. Returns array<int> of length min(nProbe, k).
  */
case class VecTopCentroids(child: Expression, cents: Array[Float],
    k: Int, dim: Int, nProbe: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) if k >= 1 && dim >= 1 && nProbe >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(FloatType, _) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_top_centroids needs k, dim, nProbe >= 1 (got k=$k dim=$dim nProbe=$nProbe)")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_top_centroids requires array<float>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "vec_top_centroids"

  def compute(vec: ArrayData): ArrayData = {
    val n = math.min(dim, vec.numElements())
    val negDots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val base = c * dim
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += vec.getFloat(i).toDouble * cents(base + i).toDouble
        i += 1
      }
      negDots(c) = -acc
      c += 1
    }
    // ascending (-dot, idx) ≡ the builtin array_sort over (d, c) structs.
    // Double.compare, not primitive <: it is a TOTAL order (primitive NaN
    // comparisons are non-transitive and can make TimSort throw
    // "Comparison method violates its general contract!"), and it matches
    // array_sort's NaN-greatest / -0.0 < 0.0 ordering exactly.
    val idx = Array.range(0, k).sortWith { (a, b) =>
      val cmp = java.lang.Double.compare(negDots(a), negDots(b))
      cmp < 0 || (cmp == 0 && a < b)
    }
    new GenericArrayData(idx.take(math.min(nProbe, k)))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecTopCentroids", this,
      classOf[VecTopCentroids].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  // value-based equality over the Array[Float] field — see VecNearestCentroid
  override def equals(other: Any): Boolean = other match {
    case o: VecTopCentroids =>
      child == o.child && k == o.k && dim == o.dim && nProbe == o.nProbe &&
        java.util.Arrays.equals(cents, o.cents)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Int.box(k), Int.box(dim),
      Int.box(nProbe), Int.box(java.util.Arrays.hashCode(cents)))

  override protected def withNewChildInternal(newChild: Expression): VecTopCentroids =
    copy(child = newChild)
}
