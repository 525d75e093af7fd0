package graft.ops

import graft.SparkSpec

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  test("basketPairs: presence-based pair counts, size cap drops, minCount floors") {
    val rows = Seq(
      // basket 1: {a, b, c}; item a repeated — presence counts once
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      // basket 2: {a, b}
      (2L, "a"), (2L, "b"),
      // basket 3: {a, b, c, d, e} — over the cap of 4, dropped whole
      (3L, "a"), (3L, "b"), (3L, "c"), (3L, "d"), (3L, "e"))
      .toDF("basket", "item")
    val out = Baskets.basketPairs(rows, "basket", "item",
        maxBasketSize = 4, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out shouldBe Map(
      ("a", "b") -> 2L, // baskets 1 and 2; basket 3 dropped entirely
      ("a", "c") -> 1L,
      ("b", "c") -> 1L)
    // minCount floors the hapax-pair tail
    val floored = Baskets.basketPairs(rows, "basket", "item", 4, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    floored shouldBe Array(("a", "b"))
    an[IllegalArgumentException] should be thrownBy
      Baskets.basketPairs(rows, "basket", "item", maxBasketSize = 1)
  }
  test("itemCosine: counts share the capped population, cosine in [0, 1e6]") {
    import spark.implicits._
    // baskets: {a,b} x3, {a,c} x1, {a} alone x2 -> n_a=6, n_b=3, n_c=1
    val rows = (
      (1 to 3).flatMap(i => Seq((i.toLong, "a"), (i.toLong, "b"))) ++
      Seq((4L, "a"), (4L, "c")) ++
      Seq((5L, "a"), (6L, "a"))).toDF("basket", "item")
    val out = Baskets.itemCosine(rows, "basket", "item", maxBasketSize = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // cos(a,b) = 3 / sqrt(6*3) = 0.70710678... -> 707107
    out(("a", "b")) shouldBe (3L, 6L, 3L, 707107L)
    // cos(a,c) = 1 / sqrt(6) -> 408248
    out(("a", "c")) shouldBe (1L, 6L, 1L, 408248L)
    // a perfect pair hits exactly 1e6
    val perfect = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
      .toDF("basket", "item")
    Baskets.itemCosine(perfect, "basket", "item", 5)
      .collect()(0).getLong(5) shouldBe 1000000L
  }

  test("associationRules: asymmetric confidence, lift pivots on 1e6") {
    // 4 baskets: {a,b} {a,b} {a,c} {d}; n_a=3 n_b=2 n_c=1 n_d=1, N=4
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "d")).toDF("basket", "item")
    val out = Baskets.associationRules(df, "basket", "item",
      maxBasketSize = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_ab"), r.getAs[Long]("support_e6"),
          r.getAs[Long]("confidence_e6"), r.getAs[Long]("lift_e6")))
      .toMap
    out.size shouldBe 4 // (a,b) and (a,c), both directions
    // a→b: conf 2/3, b→a: conf 2/2 — confidence is direction-sensitive
    out(("a", "b")) shouldBe ((2L, 500000L, 666666L, 1333333L))
    out(("b", "a")) shouldBe ((2L, 500000L, 1000000L, 1333333L))
    // lift symmetric: a,c co-occur once, lift = 1·4·1e6/(3·1) > 1e6
    out(("a", "c"))._4 shouldBe 1333333L
    out(("c", "a"))._4 shouldBe 1333333L
    // the singleton basket's item appears in no rule
    out.keys.flatMap(k => Seq(k._1, k._2)) should not contain "d"
    // independence pivot: two independent items land at ~1e6 exactly
    // when counts factorize: {x,y} {x} {y} {x,y} -> n_xy=2, N=4,
    // n_x=3, n_y=3 -> lift = 2·4e6/9 = 888888 (sub-1e6: mild repulsion)
    val ind = Seq((1L, "x"), (1L, "y"), (2L, "x"), (3L, "y"),
      (4L, "x"), (4L, "y")).toDF("basket", "item")
    Baskets.associationRules(ind, "basket", "item", 5)
      .filter(org.apache.spark.sql.functions.col("antecedent") === "x")
      .collect()(0)
      .getAs[Long]("lift_e6") shouldBe 888888L
  }
}
