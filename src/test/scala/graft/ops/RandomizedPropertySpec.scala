package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized (seeded, deterministic) property checks: each optimized
  * operator against its brute-force semantic spec on adversarially small
  * alphabets/domains — tiny strings maximize deletion-key collisions,
  * tiny value domains maximize skyline/top-k ties. The oracle gate proves
  * these on the one driver dataset; these prove them on 200-odd random
  * worlds per run. */
class RandomizedPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xC0FFEE)

  test("editDistance1Join ≡ brute-force levenshtein join on random strings") {
    // short strings over {a,b,c}: dense ed-1 neighborhoods, "" included
    val strs = (1L to 200L).map { i =>
      val len = rnd.nextInt(7)
      (i, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val df = strs.toDF("id", "s")
    val blocked = Fuzzy.editDistance1Join(df, "id", "s", maxBlockSize = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = df.as("a").join(df.as("b"),
        col("a.id") < col("b.id") &&
          levenshtein(col("a.s"), col("b.s")) <= 1)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    blocked shouldBe brute
    brute.size should be > 100 // non-vacuous: the alphabet makes pairs dense
  }

  test("skyline2D ≡ brute-force dominance on random points with heavy ties") {
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
    val df = pts.toDF("id", "x", "y")
    val fast = Pareto.skyline2D(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.map(_._1).toSet
    fast shouldBe brute
    fast.size should be >= 1
  }

  test("topk_longs ≡ sort-take on random multisets across partitionings") {
    val vals = (1 to 500).map(_ => ("g", rnd.nextInt(40).toLong))
    val expected = vals.map(_._2).sorted(Ordering[Long].reverse).take(7)
    Seq(1, 3, 17).foreach { parts =>
      val got = vals.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(expr("topk_longs(v, 7)").as("t"))
        .head().getSeq[Long](1)
      got shouldBe expected
    }
  }

  test("triangleCounts ≡ brute-force enumeration on a random graph") {
    val edges = (1 to 150).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val df = edges.toDF("u", "v")
    val fast = Graphs.triangleCounts(df, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val canon = edges.map { case (a, b) => (a.min(b), a.max(b)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = canon.flatMap { case (a, b) => Set(a, b) }.toSeq.sorted
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if canon((a, b)) && canon((b, c)) && canon((a, c))
      n <- Seq(a, b, c)
    } brute(n) += 1L
    fast shouldBe brute.toMap
    fast.values.sum should be > 0L
  }
}
