package graft.silver

import graft.SparkSpec
import graft.config.{DedupeSpec, SilverSpec}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the dedupe/filter/cast semantics (the invariants the
  * reference's unit suite asserts by example — idempotence, data-loss bound,
  * keep-by-order — tested here over ScalaCheck-generated inputs with fixed
  * seeds, so failures reproduce). */
class TransformPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Long, Double)]] =
    Gen.nonEmptyListOf(for {
      key <- Gen.chooseNum(0L, 5L) // few keys → guaranteed collisions
      ord <- Gen.chooseNum(0L, 100L)
      v <- Gen.chooseNum(-100.0, 100.0)
    } yield (key, ord, v))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("dedupe is idempotent, keeps one row per key, keeps max-by-order") {
    samples(rowsGen, 10).foreach { rows =>
      val df = rows.toDF("k", "ord", "v")
      val spec = DedupeSpec(Seq("k"), Seq("ord DESC", "v DESC"))
      val once = Transform.dedupe(spec)(df)
      once.count() shouldBe rows.map(_._1).distinct.size.toLong
      Transform.dedupe(spec)(once).count() shouldBe once.count()
      val kept = once.select("k", "ord").as[(Long, Long)].collect().toMap
      val maxOrd = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      kept.foreach { case (k, ord) => ord shouldBe maxOrd(k) }
    }
  }

  test("filters never add rows and chain conjunctively") {
    samples(rowsGen, 10).foreach { rows =>
      val df = rows.toDF("k", "ord", "v")
      val f1 = Transform.filter(Seq("v > 0"))(df).count()
      val f2 = Transform.filter(Seq("v > 0", "ord > 50"))(df).count()
      f1 should be <= rows.size.toLong
      f2 should be <= f1
      f2 shouldBe rows.count(r => r._3 > 0 && r._2 > 50).toLong
    }
  }

  test("the silver chain never increases row count (reference data-loss bound)") {
    samples(rowsGen, 5).foreach { rows =>
      val df = rows.toDF("k", "ord", "v")
      val out = Transform(SilverSpec(
        filters = Seq("v >= -100"),
        dedupe = Some(DedupeSpec(Seq("k"), Seq("ord DESC")))))(df)
      out.count() should be <= rows.size.toLong
    }
  }

  test("decimal cast parse round-trips precision/scale") {
    val pg = for {
      s0 <- Gen.chooseNum(0, 10)
      p <- Gen.chooseNum(s0 + 1, 38)
    } yield (p, s0)
    samples(pg, 25).foreach { case (p, s0) =>
      Transform.parseType(s"decimal($p,$s0)") shouldBe
        org.apache.spark.sql.types.DecimalType(p, s0)
    }
  }
}
