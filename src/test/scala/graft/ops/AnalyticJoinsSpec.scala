package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Physical-plan contracts for the multi-join analytic headliners
  * (q267–q269): correctness is the DuckDB oracle's job; THIS suite pins
  * the plans that survive a 100× scale-up — small dims broadcast,
  * fact⋈fact joins hash-based (never nested-loop/cartesian), and the
  * selective filters pushed into the parquet scans so the fact read is
  * pruned at the source.
  *
  * Plans are inspected AFTER execution (AQE's final plan), on the
  * driver-provided sf0.001 tables — the same artifact `.explain` would
  * show on a cluster. */
class AnalyticJoinsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // materialize so AQE settles on the final plan
    // an AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
    // "== Initial Plan ==" sections — keep only the final one so node
    // COUNTS (q277's two nation hops, q283's single stat-frame BNLJ)
    // count executed operators, not the pre-AQE draft again. A plan
    // with MORE than one Initial section (nested AdaptiveSparkPlan —
    // a scalar subquery would print its own pair) would make this cut
    // silently discard a later Final section, so fail LOUDLY instead
    // of truncating: such a query needs a tree-level contract.
    val s = df.queryExecution.executedPlan.toString
    val marks = "== Initial Plan ==".r.findAllIn(s).length
    require(marks <= 1,
      s"$name prints $marks '== Initial Plan ==' sections (nested " +
        "adaptive plans) - finalPlan's single-cut string surgery would " +
        "silently drop a Final section; assert this query's contract " +
        "at tree level instead")
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  private def assertHashJoinsOnly(plan: String): Unit = {
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    (plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin")) shouldBe true
  }

  test("q267 (Q3): segment filter pushed to the customer scan, hash joins only") {
    val plan = finalPlan("q267_q3_shipping_priority")
    assertHashJoinsOnly(plan)
    // the BUILDING predicate must reach the parquet reader, not sit in
    // a post-scan Filter only — at 100 TB this is the difference between
    // scanning 1/5th of customer and all of it
    plan should include("PushedFilters")
    plan should include("EqualTo(c_mktsegment,BUILDING)")
    // both date range filters pushed to their fact scans
    plan should include("LessThan(o_orderdate")
    plan should include("GreaterThan(l_shipdate")
  }

  test("q268 (Q5): region/nation/supplier ride broadcasts, facts shuffle on keys") {
    val plan = finalPlan("q268_q5_local_supplier_volume")
    assertHashJoinsOnly(plan)
    // the dim chain (region → nation → supplier) must be broadcast —
    // a shuffled 25-row nation join would add two pointless stages
    plan should include("BroadcastHashJoin")
    plan should include("EqualTo(r_name,ASIA)")
    plan should include("GreaterThanOrEqual(o_orderdate")
    // column pruning: lineitem contributes 4 of its 11 columns; the
    // widest money columns we do NOT read must not be scanned
    plan should not include "l_tax"
    plan should not include "l_shipdate"
  }

  test("q269 (Q10): returnflag pushed to the lineitem scan, nation broadcast") {
    val plan = finalPlan("q269_q10_returned_items")
    assertHashJoinsOnly(plan)
    plan should include("BroadcastHashJoin")
    plan should include("EqualTo(l_returnflag,R)")
    plan should include("GreaterThanOrEqual(o_orderdate")
  }

  test("q277 (Q7): both aliased nation hops broadcast, ship-date range pushed") {
    val plan = finalPlan("q277_q7_nation_trade")
    assertHashJoinsOnly(plan)
    // nation appears TWICE (supplier side and customer side) — both
    // hops must ride broadcasts, never a shuffled 25-row join
    "BroadcastHashJoin".r.findAllIn(plan).length should be >= 2
    plan should include("GreaterThanOrEqual(l_shipdate")
    plan should include("LessThan(l_shipdate")
    // the two-nation restriction must reach the nation parquet scans
    // as a pushed In — not survive only as the post-join pair filter
    plan should include("In(n_name")
  }

  test("q277 (Q7): two-nation restriction lands BELOW the fact joins") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    // r19 verdict: supplier/customer must be pre-restricted to the
    // two-nation key set BEFORE they meet lineitem/orders — the fact
    // join's dim side already carries supp_nation/cust_nation (nation
    // was folded in underneath), instead of all 25 nations' suppliers
    // flowing through the fact shuffle and dying in a top-level filter.
    val df = SparkEntry.queries("q277_q7_nation_trade")(spark, dir)
    df.collect()
    val joins = df.queryExecution.optimizedPlan
      .collect { case j: Join => j }
    def names(p: LogicalPlan): Set[String] = p.output.map(_.name).toSet
    def factFacing(dimCols: Set[String]): Boolean = joins.exists { j =>
      (dimCols.subsetOf(names(j.left)) &&
        names(j.right).contains("l_year")) ||
        (dimCols.subsetOf(names(j.right)) &&
          names(j.left).contains("l_year"))
    }
    // supplier side: a join against the fact whose dim input ALREADY
    // outputs (s_suppkey, supp_nation) — nation restricted below
    factFacing(Set("s_suppkey", "supp_nation")) shouldBe true
    // customer side: same contract
    factFacing(Set("c_custkey", "cust_nation")) shouldBe true
  }

  test("q278 (Q18): grouped-HAVING key set joins back as ONE hash join, ONE lineitem scan") {
    val plan = finalPlan("q278_q18_large_orders")
    assertHashJoinsOnly(plan)
    // the unbounded key set must ride a hash JOIN on o_orderkey —
    // never a collected IN literal list or a nested loop
    // the key-set derivation aggregates lineitem's 2-column projection;
    // partial aggregation (map-side combine) must be present
    plan should include("partial_sum")
    // r21 (the r20 verdict's plan-debt item): the HAVING aggregate's
    // per-order sum is CARRIED to the report as total_qty — lineitem is
    // scanned once and aggregated once, not re-joined raw and re-summed
    "lineitem\\.parquet".r.findAllIn(plan).length shouldBe 1
    "partial_sum".r.findAllIn(plan).length shouldBe 1
  }

  test("q279 (Q21): EXISTS/NOT EXISTS run as LeftSemi/LeftAnti hash joins") {
    val plan = finalPlan("q279_q21_waiting_suppliers")
    assertHashJoinsOnly(plan)
    // both quantified self-joins are equi-keyed on l_orderkey with the
    // supplier inequality as a residual — hash semi/anti, no BNLJ
    plan should include("LeftSemi")
    plan should include("LeftAnti")
    // the returnflag predicates reach the lineitem scans
    plan should include("EqualTo(l_returnflag,R)")
    plan should include("EqualTo(o_orderstatus,F)")
  }

  test("q282 (Q17): correlated avg joins back hash-keyed, brand pushed to the part scan") {
    val plan = finalPlan("q282_q17_small_qty_revenue")
    assertHashJoinsOnly(plan)
    // the selective brand predicate must reach the part parquet reader
    plan should include("EqualTo(p_brand,Brand#23)")
    // the correlated avg is a per-key aggregate (map-side combinable)
    // joined back — never a per-row re-scan of lineitem
    plan should include("partial_avg")
    // the part restriction broadcasts into BOTH lineitem branches
    "BroadcastHashJoin".r.findAllIn(plan).length should be >= 2
  }

  test("q282 (Q17): the avg side aggregates the brand-RESTRICTED lineitem") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join}
    // the correlated subquery is only probed at the selected parts'
    // keys, so the per-part avg must sit ABOVE the part semi-restriction
    // (aggregate ~73/2000 of lineitem, not all of it) — the optimized
    // plan's avg-aggregate must have a part⋈lineitem join underneath
    // AND the brand predicate itself inside its subtree (a bare
    // some-join-exists check would stay green if a refactor lifted the
    // filter above the agg-join-back, where Catalyst can push it to the
    // probe side but never through the aggregate into the avg branch)
    val df = SparkEntry.queries("q282_q17_small_qty_revenue")(spark, dir)
    df.collect()
    val avgAggs = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(
        _.toString.contains("__avg_qty")) => a
    }
    avgAggs should not be empty
    avgAggs.foreach { a =>
      a.collect { case j: Join => j } should not be empty
      a.collect { case f: Filter
        if f.condition.toString.contains("p_brand") => f
      } should not be empty
    }
  }

  test("q283 (Q22): anti join is a hash LeftAnti; the only BNLJ is the 1-row stat frame") {
    val plan = finalPlan("q283_q22_idle_balances")
    // the global-average stat frame rides a 1-row broadcast cross join —
    // the ONE sanctioned BroadcastNestedLoopJoin (nothing shuffles, the
    // customer side streams once); the churn anti-join must be hash
    "BroadcastNestedLoopJoin".r.findAllIn(plan).length shouldBe 1
    plan should not include "CartesianProduct"
    plan should include("LeftAnti")
    // the date restriction reaches the orders scan — the anti side
    // probes the RECENT orders projection, not all of history
    plan should include("GreaterThanOrEqual(o_orderdate")
    // the nation-set restriction reaches the customer scans
    plan should include("In(c_nationkey")
  }

  test("q284 (Q13): LEFT OUTER hash join, order restriction pushed to the scan") {
    val plan = finalPlan("q284_q13_customer_distribution")
    assertHashJoinsOnly(plan)
    // the outer semantics must survive to the physical join
    plan should include("LeftOuter")
    // the join-condition restriction references only the orders side,
    // so it must reach the orders PARQUET READER (pre-pruned probe),
    // never survive as a residual join condition over all of history.
    // (The date bound is ALSO pushed but toString truncates the
    // PushedFilters list right at "GreaterTh…" here, so the second
    // assertion reads it from the scan-adjacent Filter node instead.)
    plan should include("EqualTo(o_orderpriority,1-URGENT)")
    plan should include(">= 2000-01-01")
    // both aggregations keep partial (map-side) combine
    plan should include("partial_count")
  }

  test("q285 (Q8): 7-table tree — selective dims broadcast, type/region/date pushed") {
    val plan = finalPlan("q285_q8_market_share")
    assertHashJoinsOnly(plan)
    // part(type), region(name) and the date range all reach their scans
    plan should include("EqualTo(p_type,PROMO)")
    plan should include("EqualTo(r_name,AMERICA)")
    plan should include("GreaterThanOrEqual(o_orderdate")
    // the dim chains ride broadcasts: PROMO parts into lineitem, the
    // AMERICA nations into customer, the supplier-side nation names
    "BroadcastHashJoin".r.findAllIn(plan).length should be >= 3
    plan should include("partial_sum")
  }

  test("q286 (recon): FULL OUTER joins day-grain rollups, facts collapse before the join") {
    val plan = finalPlan("q286_recon_full_outer")
    assertHashJoinsOnly(plan)
    // the symmetric diff must survive as a true FullOuter join
    plan should include("FullOuter")
    // both facts aggregate to day grain BELOW the join (map-side
    // combine present) — the full outer never sees fact-grain rows
    plan should include("partial_sum")
  }

  test("dynamic partition pruning fires on a partitioned fact behind a dim filter") {
    import org.apache.spark.sql.functions.{col, sum}
    import spark.implicits._
    // the PerfConf claim made explain-checkable: a fact PARTITIONED on
    // the join key, joined to a dim whose rows are filtered on an
    // attribute the fact doesn't carry — the only way to skip fact
    // partitions is DPP injecting the dim's surviving keys into the
    // fact's PartitionFilters at runtime. At 100 TB this is the
    // difference between scanning one returnflag's partitions and all.
    val base = java.nio.file.Files
      .createTempDirectory("graft_dpp_fact").toString
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(base)
    val fact = spark.read.parquet(base)
    // the dim must be a REAL source so its selective filter survives to
    // the optimizer — a local Seq is constant-folded into a bare
    // LocalRelation (ConvertToLocalRelation) and the pruning rule then
    // sees no predicate to propagate
    val dimDir = java.nio.file.Files
      .createTempDirectory("graft_dpp_dim").toString
    Seq(("R", "returned"), ("A", "accepted"), ("N", "none"))
      .toDF("flag", "label").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact
      .join(dim.filter(col("label") === "returned"),
        fact("l_returnflag") === dim("flag"))
      .groupBy("flag").agg(sum("l_quantity").as("qty"))
    val rows = joined.collect()
    rows.length shouldBe 1
    val plan = joined.queryExecution.executedPlan.toString
    plan should include("dynamicpruning")
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("DPP fires on the SHIPPED medallion path: Transform → partitioned silver sink → mart") {
    import graft.bronze.Ingest
    import graft.config.{DerivedColumn, GoldModel, Measure, SilverSpec}
    import graft.gold.AggregationEngine
    import graft.silver.Transform
    import org.apache.spark.sql.functions.{col, max, struct}
    // r19 verdict item 3: the synthetic fixture above proves Spark CAN
    // prune; this proves OUR medallion components produce a prunable
    // layout end-to-end — the silver chain derives year/month, the S9
    // sink partitions on them, and a mart read behind a selective dim
    // filter (an attribute the fact doesn't carry) must show the dim's
    // surviving keys injected into the silver scan's PartitionFilters.
    val bronze = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_shipdate")
    val silver = Transform(SilverSpec(derived = Seq(
      DerivedColumn("year", "year(l_shipdate)"),
      DerivedColumn("month", "month(l_shipdate)"))))(bronze)
    val silverPath = java.nio.file.Files
      .createTempDirectory("graft_dpp_silver").toString
    Ingest.write(silver, silverPath, "overwrite", Seq("year", "month"))
    // calendar dim: one (year, month) carries the label the mart wants;
    // a REAL parquet source so the filter survives to the optimizer
    val target = silver
      .agg(max(struct(col("year"), col("month"))).as("ym"))
      .select(col("ym.year"), col("ym.month")).head()
    val dimDir = java.nio.file.Files
      .createTempDirectory("graft_dpp_caldim").toString
    silver.select(col("year").as("d_year"), col("month").as("d_month"))
      .distinct()
      .withColumn("d_label",
        org.apache.spark.sql.functions.when(
          col("d_year") === target.getInt(0) &&
            col("d_month") === target.getInt(1), "closing")
          .otherwise("open"))
      .write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.parquet(silverPath)
    val dim = spark.read.parquet(dimDir)
      .filter(col("d_label") === "closing")
    val mart = AggregationEngine.build(
      fact.join(dim, fact("year") === dim("d_year") &&
        fact("month") === dim("d_month")),
      GoldModel("monthly_close", groupBy = Seq("d_year", "d_month"),
        measures = Seq(Measure("total_qty", "sum(l_quantity)"))))
    val rows = mart.collect()
    rows.length shouldBe 1
    val plan = mart.queryExecution.executedPlan.toString
    plan should include("dynamicpruning")
    plan should not include "BroadcastNestedLoopJoin"
  }
}
