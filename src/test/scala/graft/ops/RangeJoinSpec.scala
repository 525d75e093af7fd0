package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def intervals = Seq(
    (1L, 0L, 100L),      // covers points 0..100
    (2L, 50L, 150L),     // overlaps interval 1 on [50,100]
    (3L, 400L, 400L),    // degenerate single-point interval
    (4L, 300L, 200L))    // end < start: empty, never matches
    .toDF("iv_id", "start", "end")

  private def points = Seq(
    (10L, 0L), (11L, 75L), (12L, 100L), (13L, 151L), (14L, 400L), (15L, 250L))
    .toDF("pt_id", "ts")

  test("pointInInterval ≡ brute-force theta join across bin widths") {
    val brute = points.join(intervals,
        col("ts") >= col("start") && col("ts") <= col("end"))
      .select("pt_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    brute should contain allOf ((10L, 1L), (11L, 1L), (11L, 2L), (14L, 3L))
    // widths smaller, comparable, and larger than the interval spans —
    // binning must never change the result, only the replication factor
    Seq(1L, 7L, 100L, 1000L).foreach { w =>
      val binned = RangeJoin.pointInInterval(points, "ts",
          intervals, "start", "end", binWidth = w)
        .select("pt_id", "iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      withClue(s"binWidth=$w: ") { binned shouldBe brute }
    }
  }

  test("concurrency counts containing intervals, 0 for uncovered points") {
    val c = RangeJoin.concurrency(points, "pt_id", "ts",
        intervals, "start", "end", binWidth = 50L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_active")).toMap
    c shouldBe Map(10L -> 1L, 11L -> 2L, 12L -> 2L, 13L -> 0L,
      14L -> 1L, 15L -> 0L)
  }

  test("overlappingPairs ≡ brute theta join, exactly once, across bin widths") {
    val a = intervals.select(col("iv_id").as("a_id"),
      col("start").as("a_start"), col("end").as("a_end"))
    val b = intervals.select(col("iv_id").as("b_id"),
      col("start").as("b_start"), col("end").as("b_end"))
    val brute = a.join(b,
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    brute should contain((1L, 2L)) // [0,100] × [50,150]
    // multiset compare: a pair meeting in several shared bins must still
    // appear exactly ONCE (the overlap-start-bin trick, not a distinct)
    Seq(1L, 7L, 100L, 1000L).foreach { w =>
      val binned = RangeJoin.overlappingPairs(a, "a_start", "a_end",
          b, "b_start", "b_end", binWidth = w)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      withClue(s"binWidth=$w: ") { binned shouldBe brute }
    }
  }

  test("bounded overlappingPairs: minOverlap filters, overlapCol is exact") {
    val a = intervals.select(col("iv_id").as("a_id"),
      col("start").as("a_start"), col("end").as("a_end"))
    val b = intervals.select(col("iv_id").as("b_id"),
      col("start").as("b_start"), col("end").as("b_end"))
    // threshold 10: the [0,100]×[50,150] pair (overlap 50) survives, the
    // degenerate self-pair of [400,400] (overlap 0) dies — self-pairs of
    // the wide intervals (overlap = own span) survive
    val got = RangeJoin.overlappingPairs(a, "a_start", "a_end",
        b, "b_start", "b_end", binWidth = 7L,
        minOverlap = 10L, overlapCol = Some("ov"))
      .select("a_id", "b_id", "ov")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set(
      (1L, 1L, 100L), (2L, 2L, 100L),
      (1L, 2L, 50L), (2L, 1L, 50L))
    // minOverlap = 0 keeps instant-touch pairs; Long.MinValue ≡ unbounded
    val zero = RangeJoin.overlappingPairs(a, "a_start", "a_end",
        b, "b_start", "b_end", binWidth = 7L,
        minOverlap = 0L, overlapCol = None)
      .count()
    val unbounded = RangeJoin.overlappingPairs(a, "a_start", "a_end",
        b, "b_start", "b_end", binWidth = 7L).count()
    zero shouldBe unbounded // all interval bounds here are non-negative spans
  }

  test("shrunken-interval threshold ≡ brute post-filter on random intervals") {
    // the rewrite (join on [s, e−T] instead of filtering overlap >= T
    // after) must find EXACTLY the brute-force pairs, for thresholds
    // below, at, and above every span in the data
    val rnd = new scala.util.Random(7)
    val ivs = (1L to 60L).map { id =>
      val s = rnd.nextInt(500).toLong
      (id, s, s + rnd.nextInt(40).toLong)
    }.toDF("iv_id", "start", "end")
    val a = ivs.select(col("iv_id").as("a_id"),
      col("start").as("a_start"), col("end").as("a_end"))
    val b = ivs.select(col("iv_id").as("b_id"),
      col("start").as("b_start"), col("end").as("b_end"))
    Seq(0L, 5L, 25L, 45L).foreach { t =>
      val brute = a.join(b,
          col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
        .filter(least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start")) >= t)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      Seq(3L, 17L, 1000L).foreach { w =>
        val got = RangeJoin.overlappingPairs(a, "a_start", "a_end",
            b, "b_start", "b_end", binWidth = w,
            minOverlap = t, overlapCol = Some("ov"))
        val pairs = got.select("a_id", "b_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        withClue(s"t=$t w=$w: ") { pairs shouldBe brute }
        // the appended overlap length must be >= t and exact
        got.filter(col("ov") !== (least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start")))).count() shouldBe 0L
        got.filter(col("ov") < t).count() shouldBe 0L
      }
    }
  }

  test("binned join plans a hash equi-join — the raw BETWEEN would BNLJ") {
    val binned = RangeJoin.pointInInterval(points, "ts",
      intervals, "start", "end", binWidth = 50L)
    val plan = binned.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    val naive = points.join(intervals,
      col("ts") >= col("start") && col("ts") <= col("end"))
    naive.queryExecution.executedPlan.toString should
      include("BroadcastNestedLoopJoin")
  }
}
