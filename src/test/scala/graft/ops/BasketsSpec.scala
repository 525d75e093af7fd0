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
}
