package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def ids(g: String, lo: Int, hi: Int) =
    (lo to hi).map(i => (g, s"user_$i"))

  test("estimate: exact while the sketch never filled") {
    val df = ids("a", 1, 37).toDF("g", "u")
    val out = Kmv.sketches(df, Seq("g"), "u", k = 64)
      .select(Kmv.estimate(col("kmv"), 64).as("est"))
      .head().getLong(0)
    out shouldBe 37L
  }

  test("estimate: saturated sketch within 15% at k=256, n=10000") {
    val df = ids("a", 1, 10000).toDF("g", "u")
    val est = Kmv.sketches(df, Seq("g"), "u", k = 256)
      .select(Kmv.estimate(col("kmv"), 256).as("est"))
      .head().getLong(0)
    est.toDouble shouldBe 10000.0 +- 1500.0
  }

  test("estimate: h(k)=0 degrades to the finite ceiling, not Infinity") {
    // a corrupt sketch ([0, 0] can never come out of kmv_sketch over
    // hash60 — two distinct non-negatives can't both be 0) must hit the
    // greatest(..., 1) guard and the EstCeiling clamp, never a
    // double-Infinity-to-BIGINT cast
    val est = spark.range(1)
      .select(Kmv.estimate(typedLit(Seq(0L, 0L)), 2).as("est"))
      .head().getLong(0)
    est shouldBe 100000000000000L
  }

  test("distinctReport: unsaturated groups report zero error") {
    val df = (ids("a", 1, 30) ++ ids("b", 1, 500)).toDF("g", "u")
    val rep = Kmv.distinctReport(df, Seq("g"), "u", k = 64)
      .orderBy("g").collect()
    val a = rep(0)
    a.getAs[Long]("n_exact") shouldBe 30L
    a.getAs[Long]("k_used") shouldBe 30L
    a.getAs[Long]("est_kmv") shouldBe 30L
    a.getAs[Long]("err_e6") shouldBe 0L
    val b = rep(1)
    b.getAs[Long]("n_exact") shouldBe 500L
    b.getAs[Long]("k_used") shouldBe 64L
    // err_e6 replays the documented quotient/remainder dag exactly
    val n = 500L
    val d = math.min(math.abs(b.getAs[Long]("est_kmv") - n), n * 1000)
    val sign = if (b.getAs[Long]("est_kmv") >= n) 1L else -1L
    b.getAs[Long]("err_e6") shouldBe
      sign * ((d / n) * 1000000L + (d % n) * 1000000L / n)
  }

  test("distinctReport: nulls excluded from both exact and sketch") {
    val df = (Seq(("a", null: String), ("a", null: String)) ++
      ids("a", 1, 5)).toDF("g", "u")
    val rep = Kmv.distinctReport(df, Seq("g"), "u", k = 8).head()
    rep.getAs[Long]("n_exact") shouldBe 5L
    rep.getAs[Long]("est_kmv") shouldBe 5L
  }

  test("overlapReport: exact when k covers the union; theta partition") {
    // A = 1..60, B = 41..100 → |A∪B| = 100, |A∩B| = 20, k = 128 ≥ 100
    val df = (ids("A", 1, 60) ++ ids("B", 41, 100)).toDF("t", "u")
    val r = Kmv.overlapReport(df, "t", "u", k = 128).head()
    r.getAs[String]("type_a") shouldBe "A"
    r.getAs[String]("type_b") shouldBe "B"
    r.getAs[Long]("k_used") shouldBe 100L
    r.getAs[Long]("n_inter_k") shouldBe 20L
    r.getAs[Long]("est_union") shouldBe 100L
    r.getAs[Long]("jaccard_e6") shouldBe 200000L
    r.getAs[Long]("est_inter") shouldBe 20L
    r.getAs[Long]("est_only_a") shouldBe 40L
    r.getAs[Long]("est_only_b") shouldBe 40L
  }

  test("overlapReport: saturated sketches keep the theta-partition sums") {
    val df = (ids("A", 1, 3000) ++ ids("B", 2000, 6000)).toDF("t", "u")
    val r = Kmv.overlapReport(df, "t", "u", k = 128).head()
    r.getAs[Long]("k_used") shouldBe 128L
    val nInter = r.getAs[Long]("n_inter_k")
    val estU = r.getAs[Long]("est_union")
    val estI = r.getAs[Long]("est_inter")
    val estA = r.getAs[Long]("est_only_a")
    val estB = r.getAs[Long]("est_only_b")
    // truncating div: the three region estimates tile est_union to < 3
    (estI + estA + estB) should be <= estU
    (estI + estA + estB) should be >= (estU - 3)
    // ground truth: union 6000-ish, inter 1001, onlyA 1999, onlyB 3000
    estU.toDouble shouldBe 6000.0 +- 1200.0
    estI.toDouble shouldBe 1001.0 +- 600.0
    nInter should be > 0L
  }

  test("overlapReport: disjoint pair still appears, jaccard 0") {
    val df = (ids("A", 1, 50) ++ ids("B", 1000, 1050)).toDF("t", "u")
    val r = Kmv.overlapReport(df, "t", "u", k = 256).head()
    r.getAs[Long]("n_inter_k") shouldBe 0L
    r.getAs[Long]("jaccard_e6") shouldBe 0L
    r.getAs[Long]("est_inter") shouldBe 0L
    r.getAs[Long]("est_only_a") shouldBe 50L
    r.getAs[Long]("est_only_b") shouldBe 51L
  }

  test("containmentReport: exact directional containment on covered unions") {
    val a = (ids("s1", 1, 40) ++ ids("s2", 100, 120)).toDF("t", "u")
    val b = (ids("e1", 21, 60) ++ ids("e2", 31, 40)).toDF("t", "u")
    val out = Kmv.containmentReport(a, "t", "u", b, "t", "u", k = 128)
      .collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r)
      .toMap
    val r11 = out(("s1", "e1")) // |s1|=40, |e1|=40, inter = 20
    r11.getAs[Long]("est_a") shouldBe 40L
    r11.getAs[Long]("est_b") shouldBe 40L
    r11.getAs[Long]("est_inter") shouldBe 20L
    r11.getAs[Long]("cont_a_in_b_e6") shouldBe 500000L
    r11.getAs[Long]("cont_b_in_a_e6") shouldBe 500000L
    // e2 = 31..40 is FULLY contained in s1 (tiny Jaccard, total leak):
    // the directional metric reads 100% where Jaccard reads 25%
    val r12 = out(("s1", "e2"))
    r12.getAs[Long]("est_inter") shouldBe 10L
    r12.getAs[Long]("cont_b_in_a_e6") shouldBe 1000000L
    r12.getAs[Long]("cont_a_in_b_e6") shouldBe 250000L
    // disjoint pair: zero everywhere
    out(("s2", "e2")).getAs[Long]("cont_a_in_b_e6") shouldBe 0L
  }

  test("consecutiveOverlap: churn decomposition on covered day pairs") {
    // day1 {u1..u30}, day2 {u21..u50}, day3 {u46..u50}; k covers unions
    val rows = (1 to 30).map(i => (1L, s"u$i")) ++
      (21 to 50).map(i => (2L, s"u$i")) ++
      (46 to 50).map(i => (3L, s"u$i"))
    val out = Kmv.consecutiveOverlap(rows.toDF("day", "u"), "day", "u",
        k = 128)
      .collect().map(r => r.getAs[Long]("type_a") -> r).toMap
    out.keySet shouldBe Set(1L, 2L) // day 3 has no successor
    val d12 = out(1L)
    d12.getAs[Long]("type_b") shouldBe 2L
    d12.getAs[Long]("est_inter") shouldBe 10L  // retained u21..u30
    d12.getAs[Long]("est_only_a") shouldBe 20L // churned u1..u20
    d12.getAs[Long]("est_only_b") shouldBe 20L // new u31..u50
    val d23 = out(2L)
    d23.getAs[Long]("est_inter") shouldBe 5L
    d23.getAs[Long]("est_only_a") shouldBe 25L
    d23.getAs[Long]("est_only_b") shouldBe 0L
  }

  test("foldSketches: fold of split halves == one-shot rebuild") {
    val all = ids("a", 1, 900) ++ ids("b", 1, 40)
    val (h1, h2) = all.partition(_._2.hashCode % 2 == 0)
    val k = 64
    val rebuilt = Kmv.sketches(all.toDF("g", "u"), Seq("g"), "u", k)
      .orderBy("g").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val folded = Kmv.foldSketches(
      Kmv.sketches(h1.toDF("g", "u"), Seq("g"), "u", k),
      Kmv.sketches(h2.toDF("g", "u"), Seq("g"), "u", k),
      Seq("g"), k)
      .orderBy("g").collect()
      .map(r => r.getString(0) ->
        (r.getSeq[Long](1), r.getAs[Long]("est_kmv"))).toMap
    folded("a")._1 shouldBe rebuilt("a")
    folded("b")._1 shouldBe rebuilt("b")
    folded("b")._2 shouldBe 40L // unsaturated → exact after fold too
  }

  test("rollingDistinct: window and cumulative semantics, exact below k") {
    // day 1: u1..u3; day 2: u3..u5; day 3: u6 — k large enough for exact
    val rows = Seq((1L, "u1"), (1L, "u2"), (1L, "u3"),
      (2L, "u3"), (2L, "u4"), (2L, "u5"), (3L, "u6"))
    val df = rows.toDF("day", "u")
    val cum = Kmv.rollingDistinct(df, "day", "u", k = 32, windowDays = 0)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est_kmv")).toMap
    cum shouldBe Map(1L -> 3L, 2L -> 5L, 3L -> 6L)
    val roll2 = Kmv.rollingDistinct(df, "day", "u", k = 32, windowDays = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est_kmv")).toMap
    roll2 shouldBe Map(1L -> 3L, 2L -> 5L, 3L -> 4L) // day3: {u3,u4,u5,u6}
    val roll1 = Kmv.rollingDistinct(df, "day", "u", k = 32, windowDays = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est_kmv")).toMap
    roll1 shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 1L)
  }

  test("crossOverlapReport: exact on covered unions; every pair appears") {
    val a = (ids("s1", 1, 40) ++ ids("s2", 100, 120)).toDF("t", "u")
    val b = (ids("e1", 21, 60) ++ ids("e2", 500, 505)).toDF("t", "u")
    val out = Kmv.crossOverlapReport(a, "t", "u", b, "t", "u", k = 128)
      .collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r)
      .toMap
    out.keySet shouldBe Set(("s1", "e1"), ("s1", "e2"),
      ("s2", "e1"), ("s2", "e2"))
    val r11 = out(("s1", "e1")) // |s1|=40, |e1|=40, inter 21..40 = 20
    r11.getAs[Long]("est_union") shouldBe 60L
    r11.getAs[Long]("est_inter") shouldBe 20L
    r11.getAs[Long]("est_only_a") shouldBe 20L
    r11.getAs[Long]("est_only_b") shouldBe 20L
    out(("s2", "e2")).getAs[Long]("n_inter_k") shouldBe 0L // disjoint
  }

  test("weightedOverlapReport: exact mass shares while sketches hold all items") {
    // A = {x (mass 60), y (30), a1 (10)}; B = {x (5), b1 (95)}.
    // k=64 covers every set → sample == set, shares are EXACT:
    //   share_a = m_a(x) / m_a(all) = 60/100; share_b = 5/100.
    val rows =
      Seq.fill(60)(("A", "x")) ++ Seq.fill(30)(("A", "y")) ++
        Seq.fill(10)(("A", "a1")) ++
        Seq.fill(5)(("B", "x")) ++ Seq.fill(95)(("B", "b1"))
    val df = rows.toDF("g", "item")
      .withColumn("occ", org.apache.spark.sql.functions.lit(1L))
    val r = Kmv.weightedOverlapReport(df, "g", "item", "occ", k = 64)
      .head()
    r.getAs[String]("type_a") shouldBe "A"
    r.getAs[Long]("k_used") shouldBe 4L
    r.getAs[Long]("n_inter_k") shouldBe 1L // only x is shared
    r.getAs[Long]("jaccard_e6") shouldBe 250000L // 1 of 4
    r.getAs[Long]("mass_a_total") shouldBe 100L
    r.getAs[Long]("mass_b_total") shouldBe 100L
    r.getAs[Long]("mass_share_a_inter_e6") shouldBe 600000L
    r.getAs[Long]("mass_share_b_inter_e6") shouldBe 50000L
  }

  test("foldSketches: groups absent from one side pass through") {
    val k = 16
    val state = Kmv.sketches(ids("only_state", 1, 5).toDF("g", "u"),
      Seq("g"), "u", k)
    val delta = Kmv.sketches(ids("only_delta", 1, 7).toDF("g", "u"),
      Seq("g"), "u", k)
    val out = Kmv.foldSketches(state, delta, Seq("g"), k)
      .orderBy("g").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_kmv")).toMap
    out("only_state") shouldBe 5L
    out("only_delta") shouldBe 7L
  }
}
