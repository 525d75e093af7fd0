package graft.quality

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the histogram-quantile mart: the algebraic fold and
  * the quantile rule must hold over ScalaCheck-generated frames with
  * negative values, nulls, skewed groups, and arbitrary splits — not just
  * the hand-traced fixtures. Fixed seeds, so failures reproduce. */
class HistogramPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Option[Long])]] =
    Gen.nonEmptyListOf(for {
      grp <- Gen.oneOf("a", "b", "c")
      v <- Gen.option(Gen.chooseNum(-500L, 500L))
    } yield (grp, v))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("histogram fold ≡ rebuild over random frames and random splits") {
    samples(rowsGen, 10).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("grp", "v")
      val binWidth = Seq(1L, 7L, 50L)(i % 3)
      // split point varies with the sample: head slice is "history"
      val cut = rows.size / 2
      val hist = rows.take(cut).toDF("grp", "v")
      val delta = rows.drop(cut).toDF("grp", "v")
      val folded = Sketches.histogramIncremental(
          Sketches.histogramState(hist, Seq("grp"), "v", binWidth),
          delta, Seq("grp"), "v", binWidth)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val rebuilt = Sketches.histogramState(df, Seq("grp"), "v", binWidth)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      withClue(s"sample $i binWidth=$binWidth: ")(folded shouldBe rebuilt)
    }
  }

  test("histogramQuantiles bracket the true quantile within one bin") {
    samples(rowsGen, 10).foreach { rows =>
      val vals = rows.collect { case (g, Some(v)) => (g, v) }
      if (vals.nonEmpty) {
        val df = rows.toDF("grp", "v")
        val binWidth = 25L
        val qs = Sketches.histogramQuantiles(
            Sketches.histogramState(df, Seq("grp"), "v", binWidth),
            Seq("grp"), binWidth, Seq(500000L))
          .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3)))
          .toMap
        vals.groupBy(_._1).foreach { case (g, gs) =>
          val sorted = gs.map(_._2).sorted
          // the rule's exact target: the ceil(q·n)-th order statistic
          val target = sorted((math.ceil(0.5 * sorted.size) - 1).max(0).toInt)
          val (lo, hi) = qs(g)
          withClue(s"group $g sorted=$sorted: ") {
            target should be >= lo
            target should be < hi
          }
        }
      }
    }
  }
}
