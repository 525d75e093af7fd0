package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the winnow candidate path: over random corpora from
  * a tiny vocabulary (which breeds natural shingle overlap), the verified
  * winnow pairs must always be a SUBSET of the full-index pairs with
  * identical exact-Jaccard values — the winnow path may trade recall,
  * never correctness. Fixed seeds, so failures reproduce. */
class DedupPropertiesSpec extends SparkSpec {
  import spark.implicits._

  // 8-word vocabulary, 6-20 tokens per doc: heavy natural overlap
  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(for {
      n <- Gen.chooseNum(6, 20)
      toks <- Gen.listOfN(n, Gen.oneOf(
        "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"))
    } yield toks.mkString(" ")).map(_.zipWithIndex.map {
      case (t, i) => (i.toLong, t)
    })

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("winnowJaccardPairs ⊆ jaccardPairs with identical jaccard, any corpus") {
    samples(corpusGen, 8).zipWithIndex.foreach { case (rows, i) =>
      val docs = rows.toDF("doc_id", "text")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3),
          r.getLong(4))
      val threshold = Seq(0.0, 0.3, 0.5)(i % 3)
      val full = Dedup.jaccardPairs(docs, "doc_id", "text", 3)
        .filter(col("jaccard") > threshold)
        .select("id_a", "id_b", "inter", "size_a", "size_b")
        .collect().map(key).toMap
      val win = Dedup.winnowJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = threshold, w = 4,
          maxFingerprintFreq = Int.MaxValue)
        .select("id_a", "id_b", "inter", "size_a", "size_b")
        .collect().map(key).toMap
      withClue(s"sample $i threshold=$threshold: ") {
        win.keySet.subsetOf(full.keySet) shouldBe true
        win.foreach { case (p, stats) => full(p) shouldBe stats }
      }
    }
  }
}
