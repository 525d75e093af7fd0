package graft.gold

import graft.SparkSpec
import graft.config.{GoldModel, Measure}
import org.apache.spark.sql.functions.col

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val model = GoldModel(
    name = "daily",
    groupBy = Seq("day"),
    measures = Seq(Measure("n", "count(1)"), Measure("total", "sum(v)"),
      Measure("last_ts", "max(event_ts)")))

  test("merge replaces updated keys and keeps the rest") {
    val existing = Seq(("d1", 1L, 10.0), ("d2", 1L, 20.0)).toDF("day", "n", "total")
    val updates = Seq(("d2", 5L, 99.0), ("d3", 2L, 30.0)).toDF("day", "n", "total")
    val merged = IncrementalMaterializer.merge(existing, updates, Seq("day"))
      .orderBy("day").collect()
    merged.map(_.getString(0)).toSeq shouldBe Seq("d1", "d2", "d3")
    merged(1).getLong(1) shouldBe 5L // d2 replaced by the update
  }

  test("refresh with no existing mart does a full build") {
    val silver = Seq(("d1", 1.0, ts("2024-01-01")), ("d1", 2.0, ts("2024-01-01")))
      .toDF("day", "v", "event_ts")
    val out = IncrementalMaterializer.refresh(
      silver, existing = None, model, "event_ts", "last_ts", lookbackDays = 7)
    out.count() shouldBe 1
    out.head().getAs[Long]("n") shouldBe 2L
  }

  test("incremental refresh equals full rebuild when lookback covers groups") {
    val silver = Seq(
      ("d1", 1.0, ts("2024-01-01")), ("d2", 2.0, ts("2024-01-02")),
      ("d3", 3.0, ts("2024-01-03")), ("d3", 4.0, ts("2024-01-03")))
      .toDF("day", "v", "event_ts")
    val full = AggregationEngine.build(silver, model)
    // existing mart built from the first two days only; last_ts is the
    // model's own watermark measure
    val oldMart = AggregationEngine.build(
      silver.filter("event_ts < timestamp'2024-01-03 00:00:00'"), model)
    val refreshed = IncrementalMaterializer.refresh(
      silver, Some(oldMart), model, "event_ts", "last_ts", lookbackDays = 1)
      .select("day", "n", "total")
    refreshed.orderBy("day").collect().map(r => (r.getString(0), r.getLong(1))) shouldBe
      full.orderBy("day").collect().map(r => (r.getString(0), r.getLong(1)))
  }

  test("refreshJoin: appends new keys, replaces updated ones, equals rebuild") {
    val dim = Seq((10L, "gold"), (20L, "basic")).toDF("cust", "tier")
    val factOld = Seq((1L, 10L, 5.0), (2L, 20L, 6.0)).toDF("id", "cust", "v")
    // id 2 re-arrives with a new value AND a new dim key; id 3 is new.
    val delta = Seq((2L, 10L, 60.0), (3L, 99L, 7.0)).toDF("id", "cust", "v")
    val existing = factOld.join(
      org.apache.spark.sql.functions.broadcast(dim), Seq("cust"), "left")
    val out = IncrementalMaterializer.refreshJoin(
      existing, delta, dim, Seq("id"), Seq("cust"))
    val factNew = Seq((1L, 10L, 5.0), (2L, 10L, 60.0), (3L, 99L, 7.0))
      .toDF("id", "cust", "v")
    val rebuild = factNew.join(dim, Seq("cust"), "left")
    out.select("id", "cust", "v", "tier").orderBy("id").collect().toSeq shouldBe
      rebuild.select("id", "cust", "v", "tier").orderBy("id").collect().toSeq
    // dim-missing key (99) stays a left-join null, not a dropped row
    out.filter("id = 3").select("tier").head().isNullAt(0) shouldBe true
  }

  test("refreshJoin rejects schema drift between view and delta⋈dim") {
    val dim = Seq((10L, "gold")).toDF("cust", "tier")
    val delta = Seq((1L, 10L, 5.0)).toDF("id", "cust", "v")
    val badView = Seq((1L, 10L, 5.0)).toDF("id", "cust", "v") // tier missing
    an[IllegalArgumentException] should be thrownBy
      IncrementalMaterializer.refreshJoin(badView, delta, dim, Seq("id"), Seq("cust"))
  }

  private def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")

  test("refreshAlgebraic: delta fold equals full rebuild, combine hand-traced") {
    import IncrementalMaterializer.AlgebraicMeasure
    val measures = Seq(
      AlgebraicMeasure("n", "count", "v"),
      AlgebraicMeasure("total", "sum", "v"),
      AlgebraicMeasure("lo", "min", "v"),
      AlgebraicMeasure("hi", "max", "v"))
    def build(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("total"),
        org.apache.spark.sql.functions.min("v").as("lo"),
        org.apache.spark.sql.functions.max("v").as("hi"))
    val hist = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v")
    val delta = Seq(("a", 1L), ("c", 7L)).toDF("k", "v") // touch + new key
    val folded = IncrementalMaterializer.refreshAlgebraic(
      build(hist), delta, Seq("k"), measures)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // invariant: fold == full rebuild over hist ∪ delta
    val full = build(hist.unionByName(delta)).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    folded.toSeq shouldBe full.toSeq
    // the combine itself: a's min folded DOWN to the delta's 1
    folded.toSeq shouldBe Seq(
      ("a", 3L, 31L, 1L, 20L),
      ("b", 1L, 5L, 5L, 5L), // untouched key passes through the anti-join
      ("c", 1L, 7L, 7L, 7L)) // delta-only key arrives whole
    // non-algebraic ops and schema drift are refused loudly
    an[IllegalArgumentException] should be thrownBy
      IncrementalMaterializer.refreshAlgebraic(build(hist), delta, Seq("k"),
        Seq(AlgebraicMeasure("a", "avg", "v")))
    an[IllegalArgumentException] should be thrownBy
      IncrementalMaterializer.refreshAlgebraic(
        build(hist).withColumnRenamed("total", "sum_v"), delta, Seq("k"),
        measures)
  }
}
