package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]): brute-force
  * cosine top-k as the exact baseline, plus a random-hyperplane LSH-bucketed
  * variant as the 100 TB scale path.
  *
  * Scale notes:
  *  - Dot products are row-local sequential folds in double precision —
  *    codegen'd expressions, no UDFs, deterministic (left-to-right fold, so
  *    results are bit-identical across engines and runs).
  *  - Brute-force: queries are broadcast; the corpus is scanned once; the
  *    only shuffle carries (query, candidate, sim) for per-query top-k
  *    ranking. Cost is O(|Q|·|corpus|·dim) — exact, and the right baseline
  *    for recall measurement, but linear in corpus size.
  *  - LSH path: each vector is sign-hashed against `numPlanes` deterministic
  *    pseudo-random hyperplanes (md5-derived coefficients, so every engine
  *    and every executor derives the same planes without shipping state).
  *    Vectors collide only within buckets ⇒ the candidate join shuffles
  *    bucket keys, not the full cross product. An IVF(coarse-quantizer)
  *    variant would replace the sign hash with nearest-centroid assignment;
  *    the plumbing (bucket → join → rank) is identical.
  */
object Similarity {

  /** Sequential-fold dot product of two float vectors in double math.
    * float×float is exact in double (24+24 ≤ 53 mantissa bits); the
    * accumulation order is the array order in both Spark and DuckDB. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, rank, sim_e6) where sim_e6 is the
    * similarity in micro-units (integer — avoids cross-engine double→string
    * rounding differences in compared output while ranking on the raw
    * double). Self-matches are excluded. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val sims = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"),
        round(col("sim") * 1e6).cast("long").as("sim_e6"))
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with cosine
    * above `threshold`. Exact (full pair scan) — the LSH variant below is the
    * scale path that prunes the same search. */
  def cosineDupes(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") > lit(threshold))
      .select(col("id_a"), col("id_b"),
        round(col("sim") * 1e6).cast("long").as("sim_e6"))
  }

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim):
    * first 4 md5 hex digits of "plane:dim" mapped to [-0.5, 0.5). Pure
    * expression — every engine/executor derives identical planes. */
  private def planeCoef(plane: Int, dim: Int): Column =
    (conv(substring(md5(lit(s"$plane:$dim")), 1, 4), 16, 10).cast("double")
      / lit(65536.0)) - lit(0.5)

  /** Sign-hash bucket key: one bit per hyperplane (sign of vec·plane). */
  def lshBucket(vecCol: Column, numPlanes: Int, dim: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val d = (0 until dim).map(i =>
        element_at(vecCol, i + 1).cast("double") * planeCoef(p, i))
        .reduce(_ + _)
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate near-dup pairs: sign-hash each vector into a
    * bucket, then run the exact pair scan only within buckets. Recall is
    * tunable via numPlanes (fewer planes → bigger buckets → higher recall,
    * more compute). */
  def lshCosineDupes(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numPlanes: Int,
      dim: Int): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", lshBucket(col("vec"), numPlanes, dim))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") > lit(threshold))
      .select(col("id_a"), col("id_b"),
        round(col("sim") * 1e6).cast("long").as("sim_e6"))
  }
}
