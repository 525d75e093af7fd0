package graft.ops

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def trips = Seq((1L, 10L, 20L), (2L, 10L, 30L), (3L, 99L, 10L))
    .toDF("trip_id", "pu_zone", "do_zone")
  private def zones = Seq((10L, "Queens"), (20L, "EWR"), (30L, "Bronx"))
    .toDF("zone_id", "borough")

  test("enrich left-joins a broadcast dimension twice with prefixes") {
    val out = Joins.enrich(
      Joins.enrich(trips, zones, "pu_zone", "zone_id", "pu"),
      zones, "do_zone", "zone_id", "do")
    out.count() shouldBe 3 // left join keeps unmatched zone 99
    val r = out.where("trip_id = 1").head()
    r.getAs[String]("pu_borough") shouldBe "Queens"
    r.getAs[String]("do_borough") shouldBe "EWR"
    out.where("trip_id = 3").head().getAs[String]("pu_borough") shouldBe null
    // the dimension is broadcast, never shuffled
    out.queryExecution.executedPlan.toString should include("BroadcastHashJoin")
  }

  test("missingKeys anti-joins distinct key tuples") {
    val target = Seq(10L, 20L).toDF("pu_zone")
    val missing = Joins.missingKeys(trips, target, Seq("pu_zone"))
    missing.as[Long].collect().toSeq shouldBe Seq(99L)
  }
}
