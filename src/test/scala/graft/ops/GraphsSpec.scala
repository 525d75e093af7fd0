package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("pageRankDirected on symmetric input reduces exactly to pageRank") {
    // feed both directions of every undirected edge: no dangling nodes
    // (D_t = 0) and uniform teleport = init, so the recurrences coincide
    val und = (1L to 30L).map(i => (i, (i * 11) % 30 + 1)).toDF("u", "v")
    val sym = und.unionAll(und.select(col("v"), col("u")))
    val directed = Graphs.pageRankDirected(sym, "u", "v", iters = 4)
      .orderBy("node").collect()
    val plain = Graphs.pageRank(und, "u", "v", iters = 4)
      .orderBy("node").collect()
    directed shouldBe plain
  }

  test("pageRankDirected: dangling mass is redistributed, not lost") {
    // chain 1→2→3: node 3 is dangling. Its mass must re-enter the graph;
    // without redistribution total rank collapses toward the 15% floor.
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val r = Graphs.pageRankDirected(chain, "u", "v", iters = 20)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // downstream accumulates: 3 > 2 > 1
    r(3L) should be > r(2L)
    r(2L) should be > r(1L)
    // total mass stays near SCALE (floor-division leak only — well above
    // the ~0.4·SCALE a dangling-mass-dropping implementation converges to)
    val total = r.values.sum
    total should be > 900000000L
    total should be <= 1000000000L
  }

  test("pageRankDirected is partitioning-independent") {
    val edges = (1L to 40L).map(i => (i, (i * 7) % 43 + 1)).toDF("u", "v")
    val a = Graphs.pageRankDirected(edges.repartition(13), "u", "v", iters = 4)
      .orderBy("node").collect()
    val b = Graphs.pageRankDirected(edges.repartition(2), "u", "v", iters = 4)
      .orderBy("node").collect()
    a shouldBe b
  }

  test("labelPropagation: disjoint cliques converge to per-clique min label") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),       // triangle A
      (10L, 11L), (11L, 12L), (10L, 12L)) // triangle B
      .toDF("u", "v")
    val out = Graphs.labelPropagation(edges, "u", "v", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L)
    // synchronous semantics, hand-traced: after ONE round node 1 holds
    // label 2 (neighbors {2,3} tie -> min), nodes 2 and 3 hold label 1
    val one = Graphs.labelPropagation(edges, "u", "v", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    one(1L) shouldBe 2L
    one(2L) shouldBe 1L
    one(3L) shouldBe 1L
  }

  test("labelPropagation is partitioning-independent") {
    val edges = (1L to 60L).map(i => (i, (i * 13) % 60 + 1)).toDF("u", "v")
    val a = Graphs.labelPropagation(edges.repartition(11), "u", "v", iters = 4)
      .orderBy("node").collect()
    val b = Graphs.labelPropagation(edges.repartition(3), "u", "v", iters = 4)
      .orderBy("node").collect()
    a shouldBe b
  }

  test("hashWalks: every step follows a real edge, deterministic, seed-varied") {
    val edges = (1L to 30L).map(i => (i, (i * 11) % 30 + 1)).toDF("u", "v")
    val walks = Graphs.hashWalks(edges, "u", "v", steps = 3, seed = 1L)
      .orderBy("start", "step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // one walk per node, steps 0..3, step 0 is the start itself
    val nodes = walks.filter(_._2 == 0L).map(_._1).toSet
    walks.length shouldBe nodes.size * 4
    walks.filter(_._2 == 0L).foreach { case (s, _, n) => n shouldBe s }
    // every transition is a genuine edge of the symmetric graph
    val edgeSet = edges.collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .filter(e => e._1 != e._2).toSet
    val byWalk = walks.groupBy(_._1).values
    byWalk.foreach { w =>
      w.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Array(a, b) => edgeSet should contain ((a, b))
        case _ =>
      }
    }
    // bit-identical across partitionings; a different seed diverges
    val rep = Graphs.hashWalks(edges.repartition(7), "u", "v", 3, seed = 1L)
      .orderBy("start", "step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rep.toSeq shouldBe walks.toSeq
    val other = Graphs.hashWalks(edges, "u", "v", 3, seed = 2L)
      .orderBy("start", "step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    other.toSeq should not be walks.toSeq
  }

  test("pageRankDirected personalization concentrates rank on the seed set") {
    // two disjoint directed cycles; personalize on cycle A's nodes only —
    // cycle B gets zero teleport and zero dangling share, so its rank
    // decays to the floor while A keeps the mass
    val cycleA = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val cycleB = Seq((11L, 12L), (12L, 13L), (13L, 11L))
    val edges = (cycleA ++ cycleB).toDF("u", "v")
    val seeds = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "w")
    val r = Graphs.pageRankDirected(edges, "u", "v", iters = 10,
      personalization = Some(seeds))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r(1L) should be > (10L * r(11L) max 1L)
    // oversized weights are refused loudly, not silently overflowed
    val big = Seq((1L, 5000000000L)).toDF("node", "w")
    an[IllegalArgumentException] should be thrownBy
      Graphs.pageRankDirected(edges, "u", "v", iters = 2,
        personalization = Some(big))
  }

  test("hits: star hand-trace, pure hubs and authorities, partition-free") {
    // 3 hubs all pointing at one authority: after round 1,
    // raw_auth(10) = 3e9, T = 3e9 -> auth = 3e9 div 3 = 1e9;
    // raw_hub(u) = 1e9 each, T = 3e9 -> hub = 333333333 each
    val star = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("u", "v")
    val r = Graphs.hits(star, "u", "v", iters = 1)
      .collect()
      .map(x => x.getAs[Long]("node") ->
        (x.getAs[Long]("hub_e9"), x.getAs[Long]("auth_e9"))).toMap
    r(10L) shouldBe ((0L, 1000000000L)) // sink: pure authority
    r(1L) shouldBe ((333333333L, 0L)) // sources: pure hubs
    r(2L) shouldBe r(1L)
    r(3L) shouldBe r(1L)
    // a chain's middle node carries both roles; the ends only one each
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val c = Graphs.hits(chain, "u", "v", iters = 3)
      .collect()
      .map(x => x.getAs[Long]("node") ->
        (x.getAs[Long]("hub_e9"), x.getAs[Long]("auth_e9"))).toMap
    c(1L)._2 shouldBe 0L // nothing points at the head
    c(3L)._1 shouldBe 0L // the tail points at nothing
    c(2L)._1 should be > 0L
    c(2L)._2 should be > 0L
    // exact integers: any partitioning bit-agrees
    val p1 = Graphs.hits(star.repartition(5), "u", "v", iters = 2)
      .orderBy("node").collect().toSeq
    val p2 = Graphs.hits(star.coalesce(1), "u", "v", iters = 2)
      .orderBy("node").collect().toSeq
    p1 shouldBe p2
  }

  test("bfsDistances: hop counts on a path, multi-source min, hop bound") {
    // path 1-2-3-4-5
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    def dists(seeds: Seq[Long], hops: Int) =
      Graphs.bfsDistances(path, "u", "v",
        seeds.toDF("node"), "node", maxHops = hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    dists(Seq(1L), 3) shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)
    // both ends seeded: the middle settles at min(2, 2); full coverage
    dists(Seq(1L, 5L), 3) shouldBe
      Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L)
    // maxHops beyond the diameter early-stops instead of running 10 rounds
    dists(Seq(1L), 10) shouldBe
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L)
  }

  test("shortestPathsBounded: hop-bounded relaxation, later-round improvement") {
    // triangle: 1-2 (10), 2-3 (10), 1-3 (25)
    val tri = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 25L))
      .toDF("u", "v", "w")
    def costs(hops: Int) =
      Graphs.shortestPathsBounded(tri, "u", "v", "w",
        Seq(1L).toDF("node"), "node", maxHops = hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one hop: only direct edges — 3 costs 25
    costs(1) shouldBe Map(1L -> 0L, 2L -> 10L, 3L -> 25L)
    // two hops: round 2 IMPROVES 3 to the 20-cost detour through 2
    costs(2) shouldBe Map(1L -> 0L, 2L -> 10L, 3L -> 20L)
    // parallel edges collapse to the cheapest before relaxation
    val par = Seq((1L, 2L, 50L), (1L, 2L, 7L)).toDF("u", "v", "w")
    Graphs.shortestPathsBounded(par, "u", "v", "w",
      Seq(1L).toDF("node"), "node", maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(1L -> 0L, 2L -> 7L)
    // direction respected; negative weights refused loudly
    val chain = Seq((1L, 2L, 5L), (2L, 3L, 5L)).toDF("u", "v", "w")
    Graphs.shortestPathsBounded(chain, "u", "v", "w",
      Seq(3L).toDF("node"), "node", maxHops = 5, directed = true)
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(3L)
    an[Exception] should be thrownBy
      Graphs.shortestPathsBounded(Seq((1L, 2L, -1L)).toDF("u", "v", "w"),
        "u", "v", "w", Seq(1L).toDF("node"), "node", maxHops = 2)
        .collect()
  }

  test("bfsDistances: directed follows edge direction; isolated seed reports 0") {
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val fromHead = Graphs.bfsDistances(chain, "u", "v",
      Seq(1L).toDF("node"), "node", maxHops = 5, directed = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fromHead shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L)
    // against the arrows: the tail seed reaches nothing when directed
    val fromTail = Graphs.bfsDistances(chain, "u", "v",
      Seq(3L).toDF("node"), "node", maxHops = 5, directed = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fromTail shouldBe Map(3L -> 0L)
    // a seed absent from the edge list still reports itself at 0
    val ghost = Graphs.bfsDistances(chain, "u", "v",
      Seq(99L).toDF("node"), "node", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ghost shouldBe Map(99L -> 0L)
  }
}
