package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Each query is fully materialized via a `noop` sink (computes every output
  * column/row like a real write, without disk I/O or the column-pruning
  * shortcut a bare `count()` would allow). AQE is on — same posture as a
  * production cluster run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.catalyst.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed warm-up pass over EVERY query, so JIT/codegen/file-footer
    // cold-start cost lands here instead of inside whichever query happens to
    // first touch a heavy operator (window exec, regex, decimal agg). Without
    // this, first-touch JIT drifts between rounds and poisons cross-round
    // comparisons.
    // Local-iteration filter: comma-separated query-name substrings.
    // Unset (the driver's posture) → every query.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    val warmT0 = System.nanoTime()
    names.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val warmupSec = (System.nanoTime() - warmT0) / 1e9
    // Settle after the ~80 s warm-up pass: the JIT/codegen churn it creates
    // leaves GC debt that otherwise lands inside whichever timed query runs
    // next (r4/r5 showed 5-14x phantom regressions on unchanged code).
    // Drop cached relations, force a full GC, and give the JVM a few
    // seconds of quiet before any timed work.
    def settle(sleepMs: Long): Unit = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(sleepMs)
    }
    settle(8000L)
    // Min over SPARK_GRAFT_REPS repetitions (default 3): single-shot
    // timings on shared hardware swing ±50% with scheduler/GC noise; the
    // minimum is the standard low-noise estimator of a query's true cost.
    // Reps are INTERLEAVED — each rep is one full round-robin pass over all
    // queries — so a transient stall (GC pause, scheduler preemption) can
    // poison at most one rep of any given query, never all of them.
    // Each timing is SETTLED (ScaleSmoke's posture: cache cleared + a short
    // quiet gap before the clock starts): r12 showed min-of-5 UNsettled reps
    // still carrying 5× per-query artifacts (q122 = 1.885 s in bench, 0.36 s
    // settled in ScaleSmoke, all five bench reps slow) — debt from the
    // PREVIOUS query (broadcast cleanup, cached-relation eviction, GC) lands
    // in the next timing, and interleaving can't help because the
    // round-robin neighbor is the same every rep.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val samples = scala.collection.mutable.Map.empty[String, Vector[(Double, Boolean)]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { rep =>
      names.foreach { case (name, fn) =>
        settle(300L)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed (rep $rep): ${e.getMessage}")
            false
          }
        samples(name) = samples(name) :+ (((System.nanoTime() - t0) / 1e9, ok))
      }
    }
    val results = names.map { case (name, _) =>
      val times = samples(name)
      (name, times.map(_._1).min, times.forall(_._2), times.map(_._1))
    }
    // Failed queries report -1 (not their elapsed time) and are listed in
    // "errors", so a run with failures can never read as a clean total.
    // Stdout keys are the qNN prefix only (full names live on the stderr
    // detail line): at ~96 queries the full-name map alone exceeded the
    // driver's bounded tail capture two rounds running (r8/r9 recorded
    // parsed=null with the line's head clipped mid-query). qNN prefixes
    // are unique by construction; if that ever breaks, fall back to full
    // names rather than emit colliding keys.
    val shortKey: String => String = {
      val pref = results.map { case (k, _, _, _) => k -> k.takeWhile(_ != '_') }
      if (pref.map(_._2).distinct.size == pref.size) pref.toMap else identity[String]
    }
    val qs = results.map { case (k, v, ok, _) =>
      "\"" + shortKey(k) + "\":" + (if (ok) f"$v%.3f" else "-1") }.mkString("{", ",", "}")
    // every rep's time per query, so min-of-N can't silently mask a
    // regression between rounds
    val ts = results.map { case (k, _, _, all) =>
      "\"" + k + "\":" + all.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false, _) => "\"" + shortKey(k) + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _) => v }.sum
    // Per-rep detail goes to stderr as the durable home for diagnostics.
    System.err.println(f"""{"detail":"per-rep","times":$ts,"errors":$errors,"warmup_sec":$warmupSec%.3f,"warmup":"full pass, untimed"}""")
    // The stdout line must stay SMALL: the driver captures a bounded tail
    // of stdout and parses the last JSON line. Round 8's shim (per-rep
    // times duplicated here) grew the line past the capture window at 96
    // queries and the driver recorded parsed=null — so only the contract
    // fields (metric/value/unit/queries/errors/sf) ride on stdout.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
