package graft.silver

import graft.SparkSpec
import graft.config._
import org.apache.spark.sql.types.{DecimalType, LongType}

class TransformSpec extends SparkSpec {
  import spark.implicits._

  private def trips = Seq(
    (1L, "a", 2.5, 10.0),
    (2L, "a", 0.0, 20.0),
    (3L, "b", 5.0, -1.0),
    (3L, "b", 5.0, 30.0))
    .toDF("id", "vendor", "distance", "fare")

  test("rename skips missing source columns silently") {
    val out = Transform.rename(Seq("vendor" -> "vendor_id", "nope" -> "x"))(trips)
    out.columns should contain("vendor_id")
    out.columns should not contain "x"
  }

  test("cast parses decimal(p,s) and defaults to (10,2)") {
    Transform.parseType("decimal(12,3)") shouldBe DecimalType(12, 3)
    Transform.parseType("decimal") shouldBe DecimalType(10, 2)
    Transform.parseType("bigint") shouldBe LongType
    an[IllegalArgumentException] should be thrownBy Transform.parseType("blob")
  }

  test("cast skips missing columns, casts present ones") {
    val out = Transform.cast(Seq(CastSpec("fare", "decimal(10,2)"),
      CastSpec("ghost", "double")))(trips)
    out.schema("fare").dataType shouldBe DecimalType(10, 2)
  }

  test("derive adds SQL-expression columns") {
    val out = Transform.derive(Seq(DerivedColumn("fare_per_mile",
      "fare / nullif(distance, 0)")))(trips)
    out.where("id = 1").select("fare_per_mile").head().getDouble(0) shouldBe 4.0
  }

  test("filters apply conjunctively incl column-vs-column") {
    val out = Transform.filter(Seq("distance > 0", "fare > distance"))(trips)
    out.select("id").as[Long].collect().sorted shouldBe Array(1L, 3L)
  }

  test("dedupe keeps first by order spec, no-op on empty keys") {
    val deduped = Transform.dedupe(DedupeSpec(Seq("id"), Seq("fare DESC")))(trips)
    deduped.count() shouldBe 3
    deduped.where("id = 3").select("fare").head().getDouble(0) shouldBe 30.0
    Transform.dedupe(DedupeSpec(Nil, Nil))(trips).count() shouldBe 4
  }

  test("crosstab pivots explicit values; absent cells null; out-of-list rows dropped") {
    import org.apache.spark.sql.functions._
    val docs = Seq(("en", "a"), ("en", "a"), ("en", "b"), ("fr", "b"),
      ("fr", "zz")) // zz is not a requested pivot value
      .toDF("lang", "src")
    val out = Transform.crosstab(docs, "lang", "src", Seq("a", "b"),
      count(lit(1)))
    out.columns.toSeq shouldBe Seq("lang", "a", "b")
    val rows = out.orderBy("lang").collect()
    (rows(0).getString(0), rows(0).getLong(1), rows(0).getLong(2)) shouldBe
      (("en", 2L, 1L))
    rows(1).getString(0) shouldBe "fr"
    rows(1).isNullAt(1) shouldBe true // fr×a never occurs
    rows(1).getLong(2) shouldBe 1L // and the zz row contributed nowhere
    an[IllegalArgumentException] should be thrownBy
      Transform.crosstab(docs, "lang", "src", Seq("a", "a"), count(lit(1)))
    an[IllegalArgumentException] should be thrownBy
      Transform.crosstab(docs, "lang", "src", Nil, count(lit(1)))
  }

  test("full chain runs rename→cast→derive→filter→dedupe in order") {
    val spec = SilverSpec(
      renames = Seq("fare" -> "fare_amount"),
      casts = Seq(CastSpec("id", "bigint")),
      derived = Seq(DerivedColumn("valid", "fare_amount > 0")),
      filters = Seq("valid"),
      dedupe = Some(DedupeSpec(Seq("id"), Seq("fare_amount DESC"))))
    val out = Transform(spec)(trips)
    out.count() shouldBe 3
    out.columns should contain("fare_amount")
  }
}
