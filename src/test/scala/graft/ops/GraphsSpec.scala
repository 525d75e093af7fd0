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
}
