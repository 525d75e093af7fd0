package graft.text

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the decomposed-window curation operators: the
  * scale-shaped implementations (per-value summary + tie-class windows)
  * must equal the naive single-global-window forms their oracles run, over
  * ScalaCheck-generated frames with duplicate scores, nulls, and adversarial
  * budgets. Fixed seeds, so failures reproduce. */
class CurationPropertiesSpec extends SparkSpec {
  import spark.implicits._

  // few distinct scores → guaranteed tie classes; nullable scores
  private val docsGen: Gen[List[(Long, Option[Long], Long)]] =
    Gen.nonEmptyListOf(for {
      score <- Gen.option(Gen.chooseNum(0L, 4L))
      tokens <- Gen.chooseNum(1L, 20L)
    } yield (score, tokens)).map(_.zipWithIndex.map {
      case ((s, t), i) => (i.toLong, s, t)
    })

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("selectUnderTokenBudget ≡ naive global-window cumsum on random frames") {
    samples(docsGen, 8).foreach { rows =>
      val df = rows.toDF("doc_id", "score", "n_tokens")
      val total = rows.map(_._3).sum
      Seq(0L, total / 3, total / 2, total, total + 10).foreach { budget =>
        val naive = df
          .withColumn("cum_tokens", sum(col("n_tokens")).over(
            Window.orderBy(col("score").desc_nulls_last, col("doc_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("cum_tokens") <= budget)
          .select("doc_id", "cum_tokens")
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        val decomposed = Curation.selectUnderTokenBudget(df, "doc_id",
            "score", "n_tokens", budget)
          .select("doc_id", "cum_tokens")
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        withClue(s"budget=$budget rows=$rows: ") {
          decomposed shouldBe naive
        }
      }
    }
  }

  test("curriculumBuckets ≡ naive global row_number bucketing on random frames") {
    samples(docsGen, 8).foreach { rows =>
      val df = rows.toDF("doc_id", "len", "n_tokens").drop("n_tokens")
      Seq(1, 3, 7).foreach { n =>
        val total = rows.size.toLong
        val naive = df
          .withColumn("rank", row_number().over(
            Window.orderBy(col("len").asc_nulls_last, col("doc_id")))
            .cast("long"))
          .withColumn("bucket", expr(s"(rank - 1L) * ${n}L div ${total}L"))
          .select("doc_id", "rank", "bucket")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        val decomposed = Curation.curriculumBuckets(df, "doc_id", "len", n)
          .select("doc_id", "rank", "bucket")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        withClue(s"nBuckets=$n rows=$rows: ") {
          decomposed shouldBe naive
        }
      }
    }
  }
}
