package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB posture): every loader returns a plain file-source
  * DataFrame so Catalyst keeps full pushdown/pruning freedom — filters and
  * projections written on top of these reach the parquet scan
  * (`PushedFilters`/`ReadSchema`), and partition-pruning works unchanged when
  * the single file is swapped for a partitioned directory tree. No caching or
  * collect here; materialization decisions belong to the caller.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos as a plain
    * long (exact — no precision loss) and expose a derived micro-precision
    * timestamp column for calendar functions. DuckDB oracles use
    * `epoch_ns(ts)` for the long and the native ts for calendar functions;
    * both engines truncate ns→µs identically (floor, all values positive).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      // Fail fast instead of mutating global session state from a loader:
      // the conf must be set in the SparkSession builder (Bench/Verify and
      // the test harness all do), not as a plan-construction side effect.
      require(
        spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
        "set spark.sql.legacy.parquet.nanosAsLong=true in the SparkSession " +
          "builder before reading the events table (TIMESTAMP(NANOS) parquet)")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts` = raw nanos long plus `ts_utc` = µs-truncated timestamp. */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
}
