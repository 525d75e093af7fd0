package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of one SparkEntry
  * query — the dev loop for checking pushdown (`PushedFilters`), pruning
  * (`ReadSchema`), join strategies (`BroadcastHashJoin`), and codegen
  * coverage (`WholeStageCodegen` spans / `(fallback)` markers).
  *
  * Usage: runMain graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: Explain <query> [sfDir]; " +
      s"queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown query $name"))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.catalyst.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try fn(spark, sfDir).explain("formatted")
    finally spark.stop()
  }
}
