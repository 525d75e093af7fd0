package graft.silver

import graft.config.{CastSpec, DedupeSpec, DerivedColumn, SilverSpec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The silver transformation chain: rename → cast → derive → filter → dedupe,
  * in the reference's fixed order (silver/jobs/bronze_to_silver.py:311-349).
  *
  * Every stage is `DataFrame => DataFrame` and purely declarative, so
  * Catalyst folds the whole chain into one optimized plan: filter strings
  * become pushable predicates (reaching the parquet scan when they reference
  * scanned columns), casts/derivations stay inside whole-stage codegen, and
  * the only shuffle in the chain is the dedupe window's hash-partition on the
  * dedupe keys. At 100 TB the dedupe shuffle is the dominant cost — keys
  * should be high-cardinality (the reference's 5-col trip key is) so the
  * exchange is well balanced; skewed keys are handled by AQE skew-split.
  */
object Transform {

  /** P1 — bulk conditional rename; silently skips absent source columns
    * (reference bronze_to_silver.py:317-321). */
  def rename(renames: Seq[(String, String)])(df: DataFrame): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** P2 — whitelisted casts incl. `decimal(p,s)` parse with the reference's
    * defaults p=10, s=2 (bronze_to_silver.py:351-379). Unknown column → skip. */
  def cast(casts: Seq[CastSpec])(df: DataFrame): DataFrame =
    casts.foldLeft(df) { (d, c) =>
      if (!d.columns.contains(c.column)) d
      else d.withColumn(c.column, col(c.column).cast(parseType(c.dataType)))
    }

  private[graft] def parseType(s: String): DataType = {
    val t = s.trim.toLowerCase
    if (t.startsWith("decimal")) {
      val ps = t.stripPrefix("decimal").stripPrefix("(").stripSuffix(")")
      val parts = ps.split(",").map(_.trim).filter(_.nonEmpty)
      val (p, sc) =
        if (parts.length == 2) (parts(0).toInt, parts(1).toInt) else (10, 2)
      DecimalType(p, sc)
    } else t match {
      case "timestamp"        => TimestampType
      case "date"             => DateType
      case "integer" | "int"  => IntegerType
      case "long" | "bigint"  => LongType
      case "double"           => DoubleType
      case "float"            => FloatType
      case "string"           => StringType
      case "boolean"          => BooleanType
      case other => throw new IllegalArgumentException(s"unsupported cast type: $other")
    }
  }

  /** P3 — derived columns from SQL expression strings
    * (bronze_to_silver.py:381-390). */
  def derive(derived: Seq[DerivedColumn])(df: DataFrame): DataFrame =
    derived.foldLeft(df)((d, dc) => d.withColumn(dc.name, expr(dc.expression)))

  /** P4 — conjunctive SQL predicate filters (bronze_to_silver.py:336-342).
    * Kept as separate `.filter` calls exactly like the reference; Catalyst
    * collapses them into one predicate and pushes scannable conjuncts down. */
  def filter(filters: Seq[String])(df: DataFrame): DataFrame =
    filters.foldLeft(df)((d, f) => d.filter(f))

  /** Parse the reference's "col [ASC|DESC]" order-spec strings
    * (bronze_to_silver.py:405-418). */
  private[graft] def parseSort(spec: String): Column = {
    val parts = spec.trim.split("\\s+")
    val c = col(parts(0))
    if (parts.length > 1 && parts(1).equalsIgnoreCase("desc")) c.desc else c.asc
  }

  /** D1 — keyed dedupe keep-first-by-order via row_number window
    * (bronze_to_silver.py:392-429). No-op when keys are empty, matching the
    * reference's warn-and-skip. One shuffle on the dedupe keys; row_number
    * short-circuits per group so no full sort of the table is needed beyond
    * the per-partition window sort. */
  def dedupe(spec: DedupeSpec)(df: DataFrame): DataFrame = {
    if (spec.keys.isEmpty) return df
    val order =
      if (spec.orderBy.nonEmpty) spec.orderBy.map(parseSort)
      else spec.keys.map(col)
    val w = Window.partitionBy(spec.keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_row_num", row_number().over(w))
      .filter(col("_row_num") === 1)
      .drop("_row_num")
  }

  /** Crosstab / pivot: one row per `rowCol` value, one aggregate column
    * per EXPLICIT `pivotValues` entry (missing combinations are null —
    * coalesce downstream if 0 is wanted). Values are required up front by
    * design: Spark's
    * value-less `pivot` runs an extra distinct-collect job over the data
    * to discover columns — at 100 TB that is a full scan just to name the
    * schema, and a drifting category set silently changes it between runs.
    * With explicit values the plan is ONE grouped aggregate (map-side
    * partials, |rowCol values| result rows) and the schema is stable.
    * Rows whose pivot value is outside `pivotValues` are dropped before
    * the aggregate (pushable predicate), matching pivot semantics. */
  def crosstab(df: DataFrame, rowCol: String, pivotCol: String,
      pivotValues: Seq[String], agg: Column): DataFrame = {
    require(pivotValues.nonEmpty, "crosstab needs explicit pivot values")
    require(pivotValues.distinct.size == pivotValues.size,
      s"duplicate pivot values in $pivotValues")
    df.filter(col(pivotCol).isin(pivotValues.map(lit): _*))
      .groupBy(col(rowCol))
      .pivot(pivotCol, pivotValues)
      .agg(agg)
  }

  /** The full chain in reference order. */
  def apply(spec: SilverSpec)(df: DataFrame): DataFrame = {
    val chain: Seq[DataFrame => DataFrame] = Seq(
      rename(spec.renames) _,
      cast(spec.casts) _,
      derive(spec.derived) _,
      filter(spec.filters) _,
      (d: DataFrame) => spec.dedupe.fold(d)(s => dedupe(s)(d)))
    chain.foldLeft(df)((d, stage) => stage(d))
  }
}
