package graft.lineage

import graft.SparkSpec
import graft.config.{DerivedColumn, SilverSpec}
import java.nio.file.Files

class LineageSpec extends SparkSpec {

  test("column lineage extracts real references from Catalyst, not tokens") {
    val spec = SilverSpec(
      renames = Seq("PULocationID" -> "pickup_location_id"),
      derived = Seq(DerivedColumn("speed",
        "trip_distance / nullif(coalesce(duration_min, fallback_min) / 60, 0)")))
    val edges = Lineage.columnLineage(spec)
    edges.find(_.kind == "RENAME").get.sources shouldBe Seq("PULocationID")
    edges.find(_.target == "speed").get.sources shouldBe
      Seq("duration_min", "fallback_min", "trip_distance")
  }

  test("tracker BFS: upstream and downstream are transitive") {
    val t = new Lineage.Tracker()
    t.record(Lineage.EventType.Ingestion, "source", "bronze.trips", 100, 100)
    t.record(Lineage.EventType.Transformation, "bronze.trips", "silver.trips", 100, 90)
    t.record(Lineage.EventType.Aggregation, "silver.trips", "gold.daily", 90, 10)
    t.record(Lineage.EventType.Aggregation, "silver.trips", "gold.hourly", 90, 24)
    t.upstream("gold.daily") shouldBe Set("silver.trips", "bronze.trips", "source")
    t.downstream("bronze.trips") shouldBe Set("silver.trips", "gold.daily", "gold.hourly")
    t.downstream("gold.daily") shouldBe Set.empty
  }

  test("events persist partitioned by (partition_day, layer) and query back") {
    val t = new Lineage.Tracker()
    t.record(Lineage.EventType.Transformation, "bronze.t", "silver.t", 10, 9,
      atMs = 1700000000000L)
    val dir = Files.createTempDirectory("graft_lineage").toString
    t.persist(spark, dir)
    val back = Lineage.eventsFor(spark, dir, "silver.t")
    back.count() shouldBe 1
    back.head().getAs[String]("layer") shouldBe "silver"
  }
}
