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

  test("saltedJoin: result-identical to the plain join, hot key spread") {
    import org.apache.spark.sql.functions.{col, countDistinct, pmod, xxhash64, struct, lit}
    // skewed probe: 900 rows on key 1, a few on others; build has dups too
    val probe = ((1 to 900).map(i => (1L, i.toLong)) ++
      Seq((2L, 1000L), (3L, 2000L))).toDF("k", "payload")
    val build = Seq((1L, "hot"), (1L, "hot2"), (2L, "warm")).toDF("k", "tag")
    val salted = Joins.saltedJoin(probe, build, Seq("k"), salt = 4)
    val plain = probe.join(build, Seq("k"))
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
    // the hot key's probe rows actually occupy >1 salt bucket
    val spread = probe.filter(col("k") === 1L)
      .withColumn("_salt",
        pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(4L)))
      .agg(countDistinct("_salt")).head().getLong(0)
    spread should be > 1L
    // outer semantics survive salting: unmatched probe rows kept once
    val lj = Joins.saltedJoin(probe, build, Seq("k"), 4, "left")
    val plainLeft = probe.join(build, Seq("k"), "left")
    lj.count() shouldBe plainLeft.count()
    lj.exceptAll(plainLeft).count() shouldBe 0L
    plainLeft.exceptAll(lj).count() shouldBe 0L
  }
}
