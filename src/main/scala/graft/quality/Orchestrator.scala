package graft.quality

import graft.config.QualitySpec
import org.apache.spark.sql.DataFrame

/** The quality orchestrator (reference: src/data_quality/orchestrator.py:
  * 74-197): run the configured checks, anomaly detection over the numeric
  * columns, and fold everything into the weighted quality-score model.
  *
  * Scale notes: all rule checks fuse into ONE aggregate pass (Checks.run);
  * each anomaly column adds one stats pass + one flag pass (Anomaly). The
  * driver sees only scalar counts — no row data crosses to the driver except
  * via the explicit ErrorTracking capture path.
  */
object Orchestrator {

  final case class QualityReport(
      rows: Long,
      checkResults: Seq[Checks.CheckResult],
      anomalyCounts: Map[String, Long],
      scores: Metrics.DimensionScores,
      overall: Double,
      level: String) {
    def passed: Boolean = checkResults.forall(_.passed)
  }

  /** Run the full quality pass. `anomalyColumns` get z-score detection at
    * `zScoreK` sigma; `hoursLate`/`slaHours` feed timeliness (defaults →
    * fresh). */
  def run(
      df: DataFrame,
      spec: QualitySpec,
      anomalyColumns: Seq[String] = Nil,
      zScoreK: Double = 3.0,
      hoursLate: Double = 0.0,
      slaHours: Double = 24.0): QualityReport = {
    val rows = df.count()
    val checkResults = Checks.run(df, spec)

    val anomalyCounts = anomalyColumns.filter(df.columns.contains).map { c =>
      c -> Anomaly.zScoreReport(df, c, zScoreK).head().getAs[Long]("anomaly_count")
    }.toMap

    val nullChecks = checkResults.filter(_.check == "null_check")
    val completeness = Metrics.completeness(
      totalCells = rows * math.max(nullChecks.size, 1),
      nullCells = nullChecks.map(_.failedCount).sum)
    val ruleChecks = checkResults.filterNot(_.check == "null_check")
    val validity = Metrics.validity(rows, ruleChecks.map(_.failedCount).sum)
    val consistency = Metrics.consistency(
      checksRun = checkResults.size,
      checksPassed = checkResults.count(_.passed))
    val accuracy = Metrics.accuracy(rows,
      anomalyCounts.values.count(_ > 0))
    val timeliness = Metrics.timeliness(hoursLate, slaHours)

    val scores = Metrics.DimensionScores(
      completeness, validity, consistency, accuracy, timeliness)
    val overall = Metrics.overall(scores)
    QualityReport(rows, checkResults, anomalyCounts, scores, overall,
      Metrics.level(overall))
  }
}
