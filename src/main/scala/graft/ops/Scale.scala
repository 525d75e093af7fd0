package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two shuffle-elimination mechanisms the 100 TB posture calls for
  * beyond broadcast hints: bucketed co-located joins (no exchange at join
  * time — the shuffle is paid once at write) and salted joins for skewed
  * keys (hot keys split across `saltFactor` tasks instead of one straggler).
  */
object Scale {

  /** Write a table bucketed (and sorted) by the join keys. Joins between
    * tables bucketed the same way on the same keys plan WITHOUT a shuffle —
    * the exchange cost is paid once here instead of per query. Bucketing
    * requires the catalog (`saveAsTable`), matching Spark's contract. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], mode: String = "overwrite"): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Salted equi-join for a skewed fact side: the fact's hot keys spread
    * across `saltFactor` partitions (salt = hash of the whole fact row —
    * deterministic, no rand()), and the other side replicates ×saltFactor.
    * Semantics are exactly the plain inner join; use when one key holds a
    * partition-sized share of rows and AQE skew-split isn't enough (e.g.
    * the skew is inside a single file split).
    *
    * `rightDf` is replicated — keep it the smaller side (dimension-ish but
    * too big or too skew-prone to broadcast). */
  def saltedJoin(fact: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col): _*), lit(saltFactor)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFact.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Convenience: register a DataFrame as a bucketed table and return the
    * catalog-backed frame (the co-located read side). */
  def asBucketedTable(spark: SparkSession, df: DataFrame, table: String,
      buckets: Int, keys: Seq[String]): DataFrame = {
    writeBucketed(df, table, buckets, keys)
    spark.table(table)
  }
}
