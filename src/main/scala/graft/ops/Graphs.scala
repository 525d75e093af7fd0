package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected edge list — the graph-shape
  * diagnostic for co-occurrence structures this repo builds everywhere
  * (basket item pairs, near-dup candidate pairs, session overlaps): a
  * dedup pair set rich in triangles means dense mirror-farms rather than
  * chains of twins, and an item graph's triangle count is the classic
  * clustering-coefficient numerator.
  *
  * Algorithm: degree-ordered orientation (the MapReduce-era standard from
  * Suri & Vassilvitskii's "Counting triangles and the curse of the last
  * reducer"). Orient every undirected edge from its lower-(degree, id)
  * endpoint to the higher one; every triangle then has exactly ONE node
  * with two out-edges (its minimum), so wedges built from co-out-edges
  * count each triangle once. Orientation caps out-degree at O(√m) even on
  * power-law graphs — the wedge join is Σ outdeg², which orientation turns
  * from "the hub explodes" into a balanced workload; that is precisely the
  * curse-of-the-last-reducer fix, and why this survives a 100 TB edge
  * list where the naive wedge-on-raw-degree join dies on the hottest key.
  *
  * Plan shape: one groupBy for degrees (broadcast back), one self-join on
  * the wedge apex, one semi-join of wedges against the oriented edge set.
  * All equi-joins — no quadratic surface anywhere.
  */
object Graphs {

  /** Per-node triangle participation counts. `edges` carries two long
    * columns (srcCol, dstCol), read as UNDIRECTED; duplicate edges and
    * self-loops are removed first. Output: (node, n_triangles), nodes in
    * no triangle omitted. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // canonical undirected edge set: a < b, deduped, no self-loops.
    // localCheckpoint (the dupClusters pattern): the edge set is referenced
    // by the degree count, the orientation join, and the wedge-closing
    // membership join — without cutting lineage here, Catalyst would
    // replay the caller's whole edge-derivation pipeline (e.g. q150's
    // basket-pair build) once per reference.
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // total order for orientation: (degree, id) — ties broken by id, so
    // the orientation is acyclic and deterministic
    val withDeg = canon
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    // checkpointed too: both wedge legs (o1, o2) read it
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("b").as("dst")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    // wedges at each apex: unordered pairs of out-neighbors
    val o1 = oriented.select(col("src").as("apex"), col("dst").as("u"))
    val o2 = oriented.select(col("src").as("apex"), col("dst").as("v"))
    val wedges = o1.join(o2, Seq("apex")).filter(col("u") < col("v"))
    // a wedge closes iff the (u, v) edge exists in the canonical set
    // (membership is orientation-free: canonical a<b matches u<v directly)
    val triangles = wedges.join(
      canon.withColumnRenamed("a", "u").withColumnRenamed("b", "v"),
      Seq("u", "v"))
    triangles
      .select(explode(array(col("apex"), col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
