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

  test("reachabilityPairs ≡ tracker BFS over the recorded graph") {
    val t = new Lineage.Tracker()
    t.record(Lineage.EventType.Ingestion, "source", "bronze.trips", 100, 100)
    t.record(Lineage.EventType.Transformation, "bronze.trips", "silver.trips", 100, 90)
    t.record(Lineage.EventType.Aggregation, "silver.trips", "gold.daily", 90, 10)
    t.record(Lineage.EventType.Aggregation, "silver.trips", "gold.hourly", 90, 24)
    t.record(Lineage.EventType.Aggregation, "gold.daily", "gold.monthly", 10, 1)
    val pairs = Lineage.reachabilityPairs(t.edgesDF(spark))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val nodes = pairs.map(_._1).toSet ++ pairs.map(_._2).toSet
    nodes.foreach { n =>
      withClue(s"node $n: ") {
        pairs.filter(_._1 == n).map(_._2).toSet shouldBe t.upstream(n)
        pairs.filter(_._2 == n).map(_._1).toSet shouldBe t.downstream(n)
      }
    }
    // depth-4 chain closed: the terminal mart sees every ancestor
    pairs.filter(_._1 == "gold.monthly").map(_._2).toSet shouldBe
      Set("gold.daily", "silver.trips", "bronze.trips", "source")
  }

  test("reachabilityPairs: a cycle converges and reports self-reachability") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"))
      .toDF("source_table", "target_table")
    val pairs = Lineage.reachabilityPairs(edges)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // every node reaches every node, including itself — the loud signal
    pairs shouldBe (for (x <- Seq("a", "b", "c"); y <- Seq("a", "b", "c"))
      yield (x, y)).toSet
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
