package graft.config

/** Declarative pipeline config model — the Scala equivalent of the
  * reference's `config/pipelines/lakehouse_config.yaml` surface
  * (reference: src/config_loader.py:21-222, silver/jobs/bronze_to_silver.py:311-349,
  * gold/jobs/build_gold_layer.py:58-187).
  *
  * The model is plain case classes so a YAML/JSON front-end (jackson) or
  * hand-construction in code both work. Semantics, in reference order:
  * rename → cast → derive → filter → dedupe (silver), then grouped
  * measure models (gold).
  */
final case class CastSpec(column: String, dataType: String)

final case class DerivedColumn(name: String, expression: String)

/** orderBy entries accept the reference's "col [ASC|DESC]" string syntax
  * (bronze_to_silver.py:405-418). */
final case class DedupeSpec(keys: Seq[String], orderBy: Seq[String])

final case class SilverSpec(
    renames: Seq[(String, String)] = Nil,
    casts: Seq[CastSpec] = Nil,
    derived: Seq[DerivedColumn] = Nil,
    filters: Seq[String] = Nil,
    dedupe: Option[DedupeSpec] = None)

/** A gold mart: config-generic measure engine (reference A5,
  * lakehouse_config.yaml:239-331). `groupBy` entries may be bare columns or
  * SQL expressions with an alias ("year(ts) AS year"); `measures` are SQL
  * aggregate expressions. */
final case class Measure(name: String, expression: String)

final case class GoldModel(
    name: String,
    groupBy: Seq[String],
    measures: Seq[Measure],
    filters: Seq[String] = Nil,
    orderBy: Seq[String] = Nil,
    limit: Option[Int] = None)

/** Quality-check configs (reference Q1-Q12 surface,
  * src/data_quality/quality_checks.py + anomaly_detection.py). */
final case class RangeCheck(column: String, min: Option[Double], max: Option[Double])
final case class InSetCheck(column: String, allowed: Seq[String])

/** Value-level regex expectation (expect_column_values_to_match_regex,
  * great_expectations.py:95-98): non-null values must match `pattern`
  * (unanchored search — anchor explicitly for full-match). */
final case class RegexCheck(column: String, pattern: String)

/** Q5-Q7 — a great-expectations-style aggregate expectation: the observed
  * scalar of `kind` ("mean_between" | "row_count_between" |
  * "unique_count_between") over `column` must land in [lo, hi]
  * (great_expectations.py:320-362). */
final case class ExpectationSpec(
    kind: String,
    column: String = "*",
    lo: Double = Double.NegativeInfinity,
    hi: Double = Double.PositiveInfinity)

object ExpectationSpec {
  /** The supported kinds — validated at config load AND in Checks.profile,
    * so a typo'd kind fails loudly instead of silently disabling a gate. */
  val Kinds: Set[String] =
    Set("mean_between", "row_count_between", "unique_count_between")
}

final case class QualitySpec(
    nullCheckColumns: Seq[String] = Nil,
    positiveColumns: Seq[String] = Nil,
    rangeChecks: Seq[RangeCheck] = Nil,
    inSetChecks: Seq[InSetCheck] = Nil,
    regexChecks: Seq[RegexCheck] = Nil,
    expectations: Seq[ExpectationSpec] = Nil,
    failOnError: Boolean = false)
