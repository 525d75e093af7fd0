package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the r16 sampling/packing operators: invariants that
  * must hold on ANY input, checked over ScalaCheck-generated frames.
  * Fixed seeds, so failures reproduce. */
class ChunkingPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val idsGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 10000L)).map(_.distinct)

  test("exactKSample: exactly min(k, n) rows, permutation-invariant, nested draws") {
    samples(idsGen, 8).zipWithIndex.foreach { case (ids, i) =>
      val df = ids.toDF("id")
      val k = Seq(1, 5, 50)(i % 3)
      val drawn = Chunking.exactKSample(df, col("id"), k, "s")
        .select("id").as[Long].collect().toSet
      drawn.size shouldBe math.min(k, ids.size)
      drawn.subsetOf(ids.toSet) shouldBe true
      // permutation invariance: reversed input, different partitioning
      val reversed = Chunking.exactKSample(
          ids.reverse.toDF("id").repartition(7), col("id"), k, "s")
        .select("id").as[Long].collect().toSet
      reversed shouldBe drawn
      // a smaller draw with the same salt is a PREFIX of the larger one
      // (top-k by the same priority) — stable downsampling
      if (k > 1) {
        val smaller = Chunking.exactKSample(df, col("id"), k - 1, "s")
          .select("id").as[Long].collect().toSet
        smaller.subsetOf(drawn) shouldBe true
      }
    }
  }

  private val sentencedGen: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(for {
      nSents <- Gen.chooseNum(1, 6)
      sents <- Gen.listOfN(nSents, for {
        n <- Gen.chooseNum(1, 9)
        ws <- Gen.listOfN(n, Gen.oneOf("one", "two", "three", "four"))
      } yield ws.mkString(" "))
    } yield sents.mkString(". ")).map(_.zipWithIndex.map {
      case (t, i) => (i.toLong, t)
    })

  test("packBySentences: budget respected, chunks contiguous, order kept") {
    samples(sentencedGen, 8).zipWithIndex.foreach { case (rows, s) =>
      val maxTokens = Seq(3, 8, 15)(s % 3)
      val out = Chunking.packBySentences(rows.toDF("doc_id", "text"),
          "doc_id", "text", maxTokens)
        .orderBy("doc_id", "sent_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
          r.getLong(4)))
      out.groupBy(_._1).foreach { case (doc, sents) =>
        withClue(s"sample $s doc $doc maxTokens=$maxTokens: ") {
          // chunk ids start at 1, contiguous, non-decreasing in sent_idx
          val chunkSeq = sents.sortBy(_._2).map(_._4)
          chunkSeq.head shouldBe 1L
          chunkSeq.sliding(2).foreach {
            case Array(a, b) => (b - a) should (be >= 0L and be <= 1L)
            case _ =>
          }
          // every chunk fits the budget OR is a single overlong sentence
          sents.groupBy(_._4).values.foreach { chunk =>
            val tokens = chunk.map(_._3).sum
            (tokens <= maxTokens ||
              (chunk.size == 1 && chunk.head._3 > maxTokens)) shouldBe true
          }
          // greedy maximality: the first sentence of chunk c+1 would NOT
          // have fit at the end of chunk c
          sents.sortBy(_._2).foldLeft((1L, 0L)) { case ((c, used), row) =>
            if (row._4 == c) (c, used + row._3)
            else { (used + row._3) should be > maxTokens.toLong; (row._4, row._3) }
          }
        }
      }
    }
  }
}
