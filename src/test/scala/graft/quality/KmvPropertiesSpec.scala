package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the KMV sketch algebra over random multisets:
  * the sketch is always the sorted distinct bottom-k (vs a brute-force
  * reference), the fold of ANY partition of the data equals the one-shot
  * sketch (merge associativity/commutativity via set algebra), and the
  * estimator is exact below k. Fixed seeds, so failures reproduce. */
class KmvPropertiesSpec extends SparkSpec {
  import spark.implicits._

  // duplicate-heavy random id multisets across a handful of groups
  private val rowsGen: Gen[List[(String, Long)]] =
    Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("g1", "g2", "g3")
      v <- Gen.chooseNum(0L, 400L)
    } yield (g, v))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def sketchOf(rows: Seq[(String, Long)], k: Int) =
    Kmv.sketches(rows.toDF("g", "u"), Seq("g"), "u", k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  test("sketch == brute-force bottom-k of the distinct HASH set, any input") {
    samples(rowsGen, 10).zipWithIndex.foreach { case (rows, i) =>
      val k = Seq(2, 5, 16)(i % 3)
      val got = sketchOf(rows, k)
      // brute force: hash every distinct value with the engine itself
      // (hash60 is the one documented hash), sort, take k
      val hashes = rows.map(_._2).distinct.toDF("u")
        .select(col("u").cast("string").as("s"))
        .select(Kmv.hash60(col("s")).as("h"), col("s"))
        .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
      val expect = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => hashes(r._2.toString)).distinct.sorted.take(k)
      }
      withClue(s"sample $i k=$k: ") {
        got.view.mapValues(_.toList).toMap shouldBe
          expect.view.mapValues(_.toList).toMap
      }
    }
  }

  test("fold of any split == one-shot sketch; estimate exact below k") {
    samples(rowsGen, 10).zipWithIndex.foreach { case (rows, i) =>
      val k = Seq(4, 8, 32)(i % 3)
      val cut = (rows.size * (i % 5)) / 5
      val (h1, h2) = rows.splitAt(cut)
      val oneShot = sketchOf(rows, k)
      val folded =
        if (h1.isEmpty || h2.isEmpty) sketchOf(rows, k)
        else Kmv.foldSketches(
          Kmv.sketches(h1.toDF("g", "u"), Seq("g"), "u", k),
          Kmv.sketches(h2.toDF("g", "u"), Seq("g"), "u", k),
          Seq("g"), k)
          .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      withClue(s"sample $i k=$k cut=$cut: ") {
        folded.view.mapValues(_.toList).toMap shouldBe
          oneShot.view.mapValues(_.toList).toMap
      }
      // exactness below saturation
      val exact = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
      val ests = Kmv.sketches(rows.toDF("g", "u"), Seq("g"), "u", k)
        .select(col("g"), Kmv.estimate(col("kmv"), k).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (g, n) =>
        if (n < k) withClue(s"sample $i group $g: ") {
          ests(g) shouldBe n.toLong
        }
      }
    }
  }
}
