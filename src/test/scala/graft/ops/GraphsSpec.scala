package graft.ops

import graft.SparkSpec

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts: counts each triangle once per member node") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant edge
    // 4-5 (no triangle) and a disconnected edge 6-7.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L))
      .toDF("u", "v")
    val out = Graphs.triangleCounts(edges, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("triangleCounts: dedupes reversed/duplicate edges, drops self-loops") {
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), // one undirected edge
      (2L, 3L), (3L, 1L),
      (1L, 1L)) // self-loop, ignored
      .toDF("u", "v")
    val out = Graphs.triangleCounts(edges, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("triangleCounts: triangle-free graph yields empty output") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    Graphs.triangleCounts(path, "u", "v").count() shouldBe 0L
  }

  test("pageRank: hub outranks leaves; symmetric graph ranks equally") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("u", "v")
    val ranks = Graphs.pageRank(star, "u", "v", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ranks(1L) should be > ranks(2L)
    ranks(2L) shouldBe ranks(3L) // leaves are symmetric — exactly equal
    // triangle: full symmetry, all ranks identical and stable
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    Graphs.pageRank(tri, "u", "v", iters = 3)
      .select("rank_e9").distinct().count() shouldBe 1L
  }

  test("pageRank is partitioning-independent (exact integer arithmetic)") {
    val edges = (1L to 40L).map(i => (i, (i * 7) % 40 + 1)).toDF("u", "v")
    val a = Graphs.pageRank(edges.repartition(13), "u", "v", iters = 4)
      .orderBy("node").collect()
    val b = Graphs.pageRank(edges.repartition(2), "u", "v", iters = 4)
      .orderBy("node").collect()
    a shouldBe b
  }

  test("kCore: K4 survives a 3-peel, pendants and paths do not") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (4L, 5L), (5L, 6L)) // tail — peels away (5 first, then nothing new)
      .toDF("u", "v")
    val core = Graphs.kCore(edges, "u", "v", k = 3, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    core shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
    // a path has no 2-core: it peels to empty from the ends inward
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    Graphs.kCore(path, "u", "v", k = 2, maxRounds = 10).count() shouldBe 0L
    // bounded rounds stop early by contract: ONE peel of the path drops
    // only the end nodes' edges
    Graphs.kCore(path, "u", "v", k = 2, maxRounds = 1)
      .count() should be > 0L
  }

  test("pageRankWeighted: unit weights reduce to pageRank; weight skews rank") {
    import org.apache.spark.sql.functions.lit
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
      .withColumn("w", lit(1L))
    val plain = Graphs.pageRank(edges, "u", "v", iters = 4)
      .orderBy("node").collect()
    val unit = Graphs.pageRankWeighted(edges, "u", "v", "w", iters = 4)
      .orderBy("node").collect()
    unit shouldBe plain
    // heavy 3-4 edge: node 4 absorbs most of 3's rank
    val weighted = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L), (3L, 4L, 100L))
      .toDF("u", "v", "w")
    val r = Graphs.pageRankWeighted(weighted, "u", "v", "w", iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val ru = Graphs.pageRankWeighted(weighted.withColumn("w", lit(1L)),
        "u", "v", "w", iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r(4L) should be > ru(4L)
  }

  test("pageRank on an edgeless graph returns empty, not a crash") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("u", "v")
    Graphs.pageRank(none, "u", "v", iters = 2).count() shouldBe 0L
    val selfOnly = Seq((3L, 3L)).toDF("u", "v") // self-loops drop to empty
    Graphs.pageRank(selfOnly, "u", "v", iters = 2).count() shouldBe 0L
  }
}
