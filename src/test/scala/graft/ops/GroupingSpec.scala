package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GroupingSpec extends SparkSpec {
  import spark.implicits._

  private val sales = Seq(
    ("east", "a", 10L), ("east", "a", 5L), ("east", "b", 7L),
    ("west", "a", 2L))
    .toDF("region", "sku", "qty")

  test("rollupAgg: detail, per-prefix subtotal, grand total, gid bitmask") {
    val out = Grouping.rollupAgg(sales, Seq("region", "sku"),
        Seq(sum($"qty").as("qty")))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    out shouldBe Set(
      // gid 0: detail level
      ("east", "a", 0L, 15L), ("east", "b", 0L, 7L), ("west", "a", 0L, 2L),
      // gid 1: sku rolled up (rightmost dim = LSB)
      ("east", null, 1L, 22L), ("west", null, 1L, 2L),
      // gid 3: grand total
      (null, null, 3L, 24L))
  }

  test("cubeAgg: all four grouping sets, including the rollup-absent (sku)") {
    val out = Grouping.cubeAgg(sales, Seq("region", "sku"),
        Seq(sum($"qty").as("qty")))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // gid 2 = region rolled up (MSB set): the lattice row ROLLUP lacks.
    out.filter(_._3 == 2L) shouldBe Set(
      (null, "a", 2L, 17L), (null, "b", 2L, 7L))
    out.map(_._3) shouldBe Set(0L, 1L, 2L, 3L)
    out.size shouldBe 3 + 2 + 2 + 1
  }
  test("shareOfParent: integer-e6 shares per parent, zero parent -> null") {
    import spark.implicits._
    val df = Seq(
      ("A", 1L, 30L), ("A", 2L, 60L), ("A", 2L, 10L), // A: 30 + 70 = 100
      ("B", 1L, 0L)) // B's total is 0 -> share undefined
      .toDF("typ", "day", "v")
    val out = Grouping.shareOfParent(df, Seq("typ"), Seq("day"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3),
          Option(r.getAs[Any]("share_e6")).map(_.asInstanceOf[Long]))).toMap
    out(("A", 1L)) shouldBe (30L, 100L, Some(300000L))
    out(("A", 2L)) shouldBe (70L, 100L, Some(700000L))
    out(("B", 1L)) shouldBe (0L, 0L, None)
  }

  test("pivotMart: pinned schema, zero cells, off-list rows dropped") {
    val rows = Seq(
      (1L, "a", Some(10L)), (1L, "a", Some(5L)), (1L, "b", Some(7L)),
      (2L, "a", None), // counted, sums 0
      (2L, "zzz", Some(99L))) // off-list: contributes to NO cell
      .toDF("day", "t", "v")
    val out = Grouping.pivotMart(rows, "day", "t", "v", Seq("a", "b"))
      .orderBy("day").collect()
    out.map(_.schema.fieldNames.toSeq).head shouldBe
      Seq("day", "a_n", "a_sum", "b_n", "b_sum")
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSeq shouldBe Seq(
      (1L, 2L, 15L, 1L, 7L),
      (2L, 1L, 0L, 0L, 0L)) // null value: counted once, sum 0; b empty: 0s
    an[IllegalArgumentException] should be thrownBy
      Grouping.pivotMart(rows, "day", "t", "v", Seq())
    an[IllegalArgumentException] should be thrownBy
      Grouping.pivotMart(rows, "day", "t", "v", Seq("a", "a"))
  }
}
