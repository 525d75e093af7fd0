package graft

import graft.config._
import graft.config.ConfigLoader.PipelineConfig

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def bronzeDf = Seq(
    (1L, "A", 2.0, 10.0), (2L, "B", 0.0, 20.0), // zero distance filtered
    (3L, "A", 5.0, 30.0), (3L, "A", 5.0, 30.0)) // dup of id 3
    .toDF("id", "vendor", "distance", "fare")

  private def config = PipelineConfig(
    version = "1.0",
    name = "trips",
    bronze = None,
    silver = SilverSpec(
      filters = Seq("distance > 0"),
      dedupe = Some(DedupeSpec(Seq("id"), Seq("fare DESC")))),
    gold = Seq(GoldModel("by_vendor", Seq("vendor"),
      Seq(Measure("trips", "count(1)"), Measure("total_fare", "sum(fare)")))),
    quality = QualitySpec(positiveColumns = Seq("fare"), failOnError = true))

  test("medallion run: bronze → silver → gold with reference invariants") {
    val r = Pipeline.run(spark, config, bronzeDf)
    val rows = r.stages.map(s => s.name -> s.rows).toMap
    rows("bronze") shouldBe 4L
    rows("silver") shouldBe 2L // filter drops 1, dedupe drops 1
    rows("silver") should be <= rows("bronze") // e2e invariant
    rows("gold.by_vendor") shouldBe 1L
    r.qualityResults.forall(_.passed) shouldBe true
    // lineage recorded the whole chain
    r.lineage.upstream("gold.by_vendor") shouldBe
      Set("silver.trips", "bronze.trips", "source")
  }

  test("quality gate: failOnError aborts on violations") {
    val bad = Seq((1L, "A", 2.0, -10.0)).toDF("id", "vendor", "distance", "fare")
    val e = the[IllegalStateException] thrownBy Pipeline.run(spark, config, bad)
    e.getMessage should include("positive_values")
  }

  test("gold sink receives each mart exactly once") {
    var sunk = Map.empty[String, Long]
    Pipeline.run(spark, config, bronzeDf,
      goldSink = Some((name, df) => sunk += name -> df.count()))
    sunk shouldBe Map("by_vendor" -> 1L)
  }
}
