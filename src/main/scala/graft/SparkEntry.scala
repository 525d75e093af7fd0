package graft

import graft.config._
import graft.gold.AggregationEngine
import graft.ops.Joins
import graft.quality.Checks
import graft.silver.Transform
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB oracle in `oracleSql`.
  *
  * Determinism rules for oracle parity (Spark vs DuckDB on the same parquet):
  *  - money aggregates go through exact DECIMAL sums, cast to DOUBLE at the
  *    end (double summation is order-dependent; decimal is exact);
  *  - event timestamps are compared in MICROseconds (`ts div 1000` ≡
  *    DuckDB `epoch_us(ts)`) because DuckDB truncates the file's NANOS
  *    precision to µs at read while Spark keeps the raw long;
  *  - derived integers are cast to BIGINT on both sides (DuckDB year()/
  *    dayofweek() return BIGINT, Spark returns INT);
  *  - Spark dayofweek() is 1=Sunday; DuckDB dayofweek() is 0=Sunday → +1;
  *  - every result carries a total ORDER BY on a unique key set.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---- shared expression fragments -------------------------------------

  /** exact sum of a money column: decimal-sum then double. */
  private def dsum(c: String, scale: Int = 2): String =
    s"cast(sum(cast($c as decimal(18,$scale))) as double)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A5/P4 — TPC-H Q1-style pricing summary (hash agg, map-side partial)
    "q01_pricing_summary" -> ((s, dir) => {
      AggregationEngine.build(
        Tables.load(s, dir, "lineitem"),
        GoldModel(
          name = "pricing_summary",
          groupBy = Seq("l_returnflag", "l_linestatus"),
          measures = Seq(
            Measure("count_order", "count(1)"),
            Measure("sum_qty", "sum(l_quantity)"),
            Measure("sum_base_price", dsum("l_extendedprice")),
            Measure("sum_disc_price", dsum("l_extendedprice * (1 - l_discount)", 4)),
            Measure("avg_qty", "sum(l_quantity) / count(l_quantity)"),
            Measure("avg_price", s"${dsum("l_extendedprice")} / count(l_extendedprice)")),
          filters = Seq("l_shipdate <= timestamp'1999-12-31 00:00:00'"),
          orderBy = Seq("l_returnflag", "l_linestatus")))
    }),

    // A1 analogue of gold daily_trip_stats on events (year/month/dow keys)
    "q02_daily_stats" -> ((s, dir) => {
      AggregationEngine.build(
        Tables.events(s, dir),
        GoldModel(
          name = "daily_stats",
          groupBy = Seq(
            "cast(year(ts_utc) as bigint) as year",
            "cast(month(ts_utc) as bigint) as month",
            "cast(dayofweek(ts_utc) as bigint) as day_of_week",
            "event_type"),
          measures = Seq(
            Measure("total_events", "count(1)"),
            Measure("sum_value", dsum("value")),
            Measure("avg_value", s"${dsum("value")} / count(value)"),
            Measure("min_value", "min(value)"),
            Measure("max_value", "max(value)")),
          orderBy = Seq("year", "month", "day_of_week", "event_type")))
    }),

    // A2 analogue of gold hourly_location_analysis
    "q03_hourly_stats" -> ((s, dir) => {
      AggregationEngine.build(
        Tables.events(s, dir),
        GoldModel(
          name = "hourly_stats",
          groupBy = Seq(
            "event_type",
            "cast(hour(ts_utc) as bigint) as hour_of_day"),
          measures = Seq(
            Measure("total_events", "count(1)"),
            Measure("sum_value", dsum("value")),
            Measure("avg_value", s"${dsum("value")} / count(value)")),
          orderBy = Seq("event_type", "hour_of_day")))
    }),

    // A3 analogue of revenue_by_payment_type incl. the dbt CASE-WHEN ratio
    "q04_revenue_stats" -> ((s, dir) => {
      AggregationEngine.build(
        Tables.load(s, dir, "lineitem"),
        GoldModel(
          name = "revenue_stats",
          groupBy = Seq(
            "cast(year(l_shipdate) as bigint) as year",
            "cast(month(l_shipdate) as bigint) as month",
            "l_returnflag"),
          measures = Seq(
            Measure("total_items", "count(1)"),
            Measure("sum_base_price", dsum("l_extendedprice")),
            Measure("sum_disc_amount", dsum("l_extendedprice * l_discount", 4)),
            Measure("avg_base_price", s"${dsum("l_extendedprice")} / count(l_extendedprice)"),
            Measure("disc_pct",
              s"case when sum(cast(l_extendedprice as decimal(18,2))) > 0 " +
              s"then ${dsum("l_extendedprice * l_discount", 4)} / ${dsum("l_extendedprice")} * 100 " +
              s"else cast(0 as double) end")),
          orderBy = Seq("year", "month", "l_returnflag")))
    }),

    // J1 — double dimension enrichment (broadcast), zones-style aliasing
    "q05_enrich_join" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
      val prt = Tables.load(s, dir, "part").select("p_partkey", "p_name", "p_brand")
      val e1 = Joins.enrich(li, sup, "l_suppkey", "s_suppkey", "sup")
      val e2 = Joins.enrich(e1, prt, "l_partkey", "p_partkey", "prt")
      e2.select(col("l_orderkey"), col("l_linenumber"),
          col("sup_s_name").as("supplier_name"),
          col("prt_p_name").as("part_name"),
          col("prt_p_brand").as("part_brand"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J2 — join + group-agg + order + limit (top segments)
    "q06_top_segments" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_mktsegment")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("order_count"),
          (expr(dsum("o_totalprice")) / count(col("o_totalprice"))).as("avg_price"))
        .orderBy(col("order_count").desc, col("c_mktsegment"))
        .limit(15)
    }),

    // J3 — two-hop broadcast join chain + top-k (routes analogue)
    "q07_nation_orders" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("order_count"),
          expr(dsum("o_totalprice")).as("total_price"))
        .orderBy(col("order_count").desc, col("n_name"))
        .limit(10)
    }),

    // D1 — keyed dedupe keep-first-by-order (row_number window)
    "q08_dedupe" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      Transform.dedupe(DedupeSpec(
        keys = Seq("user_id", "event_type"),
        orderBy = Seq("ts_us DESC", "event_id DESC")))(ev)
        .select("user_id", "event_type", "event_id", "ts_us")
        .orderBy("user_id", "event_type")
    }),

    // D3 — distinct key projection
    "q09_distinct_pairs" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type")
    }),

    // J4/SET1 — anti-join key integrity (customers with no orders)
    "q10_missing_keys" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .withColumnRenamed("o_custkey", "c_custkey")
      Joins.missingKeys(c, o, Seq("c_custkey")).orderBy("c_custkey")
    }),

    // O1/O2 — global top-k (TakeOrderedAndProject, no full sort)
    "q11_topk_orders" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // W1/Q12 — moving average over a 7-row window frame (exact via decimal)
    "q12_moving_avg" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(-6, 0)
      ev.withColumn("mov_sum", sum(expr("cast(value as decimal(18,2))")).over(w))
        .withColumn("mov_cnt", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"),
          (col("mov_sum").cast("double") / col("mov_cnt")).as("mov_avg"))
        .orderBy("event_id")
    }),

    // P1/P2/P4/P5 — silver chain: rename → cast → filter (incl col-vs-col).
    // The compared cast is double→bigint on integral quantities (lossless and
    // identical across engines); double→decimal casts round differently in
    // Spark vs DuckDB on half-way binary doubles, so decimal casts are
    // exercised in TransformSpec, not in an oracle-compared projection.
    "q13_silver_chain" -> ((s, dir) => {
      Transform(SilverSpec(
        renames = Seq("l_extendedprice" -> "price", "l_quantity" -> "qty"),
        casts = Seq(CastSpec("qty", "bigint")),
        filters = Seq("qty > 0", "l_discount < l_tax",
          "l_shipdate < timestamp'2001-01-01 00:00:00'")))(
        Tables.load(s, dir, "lineitem"))
        .select("l_orderkey", "l_linenumber", "price", "qty")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q1 — one-pass null-count profile
    "q14_null_counts" -> ((s, dir) =>
      Checks.nullCounts(Tables.load(s, dir, "events"),
        Seq("event_id", "user_id", "event_type", "value"))),

    // Q3 — one-pass range-violation counts
    "q15_range_check" -> ((s, dir) =>
      Checks.rangeViolations(Tables.load(s, dir, "lineitem"),
        Seq(RangeCheck("l_quantity", Some(1.0), Some(50.0)),
          RangeCheck("l_discount", Some(0.0), Some(0.1))))),

    // Q4 — in-set membership violation count
    "q16_inset_check" -> ((s, dir) =>
      Checks.notInSetCounts(Tables.load(s, dir, "events"),
        Seq(InSetCheck("event_type", Seq("click", "view", "purchase"))))),

    // A10 — conditional count (count CASE WHEN)
    "q17_conditional_agg" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(count(when(col("value") > 100, 1)).as("high_value_events"),
          count(lit(1)).as("total_events"))
        .orderBy("event_type")
    }),

    // SET2 — unionByName of two slices then aggregate
    "q18_union_slices" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val early = o.filter("o_orderdate < timestamp'1997-01-01 00:00:00'")
      val late = o.filter("o_orderdate >= timestamp'1999-01-01 00:00:00'")
      early.unionByName(late)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderstatus")
    }),

    // SET1 — EXCEPT on distinct keys
    "q19_except_users" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.select("user_id").distinct()
        .except(ev.filter(col("event_type") === "error").select("user_id").distinct())
        .orderBy("user_id")
    }),

    // P3/§2.7 — scalar-function surface (date parts, CASE, COALESCE, BETWEEN)
    "q20_scalar_funcs" -> ((s, dir) => {
      Tables.events(s, dir).select(
        col("event_id"),
        expr("cast(year(ts_utc) as bigint)").as("y"),
        expr("cast(month(ts_utc) as bigint)").as("m"),
        expr("cast(dayofweek(ts_utc) as bigint)").as("dow"),
        expr("cast(hour(ts_utc) as bigint)").as("h"),
        expr("ts div 1000000000").as("epoch_sec"),
        expr("case when value between 0 and 100 then 'low' " +
          "when value <= 300 then 'mid' else 'high' end").as("val_bucket"),
        coalesce(nullif(col("event_type"), lit("error")), lit("none")).as("etype"),
        abs(col("value") * lit(-1)).as("abs_value"))
        .orderBy("event_id")
    }))

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | count(*) AS count_order,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | sum(l_quantity) / count(l_quantity) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_daily_stats" ->
      """SELECT CAST(year(ts) AS BIGINT) AS year, CAST(month(ts) AS BIGINT) AS month,
        | CAST(dayofweek(ts) + 1 AS BIGINT) AS day_of_week, event_type,
        | count(*) AS total_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1,2,3,4 ORDER BY 1,2,3,4""".stripMargin,
    "q03_hourly_stats" ->
      """SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
        | count(*) AS total_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q04_revenue_stats" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
        | CAST(month(l_shipdate) AS BIGINT) AS month, l_returnflag,
        | count(*) AS total_items,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_amount,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_base_price,
        | CASE WHEN sum(CAST(l_extendedprice AS DECIMAL(18,2))) > 0
        |   THEN CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
        |        / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 100
        |   ELSE CAST(0 AS DOUBLE) END AS disc_pct
        |FROM lineitem GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "q05_enrich_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, s.s_name AS supplier_name,
        | p.p_name AS part_name, p.p_brand AS part_brand
        |FROM lineitem l
        |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "q06_top_segments" ->
      """SELECT c_mktsegment, count(*) AS order_count,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY order_count DESC, c_mktsegment LIMIT 15""".stripMargin,
    "q07_nation_orders" ->
      """SELECT n_name, count(*) AS order_count,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY order_count DESC, n_name LIMIT 10""".stripMargin,
    "q08_dedupe" ->
      """SELECT user_id, event_type, event_id, ts_us FROM (
        | SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |                     ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        | FROM events) t WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q09_distinct_pairs" ->
      "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
    "q10_missing_keys" ->
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,
    "q11_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q12_moving_avg" ->
      """SELECT event_id, user_id,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |   / count(*) OVER w AS mov_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q13_silver_chain" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice AS price, CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_quantity > 0 AND l_discount < l_tax
        |  AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q14_null_counts" ->
      """SELECT count(CASE WHEN event_id IS NULL THEN 1 END) AS event_id_nulls,
        | count(CASE WHEN user_id IS NULL THEN 1 END) AS user_id_nulls,
        | count(CASE WHEN event_type IS NULL THEN 1 END) AS event_type_nulls,
        | count(CASE WHEN value IS NULL THEN 1 END) AS value_nulls
        |FROM events""".stripMargin,
    "q15_range_check" ->
      """SELECT count(CASE WHEN l_quantity < 1.0 THEN 1 END) AS l_quantity_below_min,
        | count(CASE WHEN l_quantity > 50.0 THEN 1 END) AS l_quantity_above_max,
        | count(CASE WHEN l_discount < 0.0 THEN 1 END) AS l_discount_below_min,
        | count(CASE WHEN l_discount > 0.1 THEN 1 END) AS l_discount_above_max
        |FROM lineitem""".stripMargin,
    "q16_inset_check" ->
      """SELECT count(CASE WHEN event_type NOT IN ('click','view','purchase') THEN 1 END)
        | AS event_type_not_in_set
        |FROM events""".stripMargin,
    "q17_conditional_agg" ->
      """SELECT event_type,
        | count(CASE WHEN value > 100 THEN 1 END) AS high_value_events,
        | count(*) AS total_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q18_union_slices" ->
      """SELECT o_orderstatus, count(*) AS order_count FROM (
        | SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        | UNION ALL
        | SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') t
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q19_except_users" ->
      """SELECT DISTINCT user_id FROM events
        |EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin,
    "q20_scalar_funcs" ->
      """SELECT event_id,
        | CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
        | CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, CAST(hour(ts) AS BIGINT) AS h,
        | epoch_us(ts) // 1000000 AS epoch_sec,
        | CASE WHEN value BETWEEN 0 AND 100 THEN 'low'
        |      WHEN value <= 300 THEN 'mid' ELSE 'high' END AS val_bucket,
        | COALESCE(NULLIF(event_type, 'error'), 'none') AS etype,
        | abs(value * -1) AS abs_value
        |FROM events ORDER BY event_id""".stripMargin)
}
