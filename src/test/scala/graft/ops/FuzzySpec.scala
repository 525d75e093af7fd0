package graft.ops

import graft.SparkSpec

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("editDistance1Join: finds exactly the ed<=1 pairs (sub, ins/del, eq)") {
    val names = Seq(
      (1L, "martin"),  // ~2 substitution, ~3 deletion
      (2L, "marvin"),  // substitution of 1
      (3L, "martn"),   // deletion from 1
      (4L, "martinez"), // ed 2 from 1 — must NOT pair
      (5L, "bob"),
      (6L, "bob"))     // exact duplicate of 5 → dist 0
      .toDF("id", "name")
    val out = Fuzzy.editDistance1Join(names, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // (2,3) marvin↔martn is ed 2 — correctly absent.
    out shouldBe Map(
      (1L, 2L) -> 1L, (1L, 3L) -> 1L,
      (5L, 6L) -> 0L)
  }

  test("editDistance1JoinBetween: cross-table linkage incl. multi-match") {
    val canon = Seq((1L, "cat7"), (2L, "cat9"), (3L, "dog4")).toDF("id", "name")
    val probes = Seq(
      (10L, "cat"),   // last char dropped: matches BOTH cat7 and cat9
      (11L, "dogg4"), // one insertion from dog4
      (12L, "bird"))  // matches nothing
      .toDF("pid", "pname")
    val out = Fuzzy.editDistance1JoinBetween(
        probes, "pid", "pname", canon, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out shouldBe Map(
      (10L, 1L) -> 1L, (10L, 2L) -> 1L,
      (11L, 3L) -> 1L)
  }

  test("editDistance1Join: maxBlockSize drops hot blocks whole") {
    // 1-char strings all share the "" deletion key → one hot block.
    val tiny = (1L to 30L).map(i => (i, ('a' + (i % 26)).toChar.toString))
      .toDF("id", "s")
    val capped = Fuzzy.editDistance1Join(tiny, "id", "s", maxBlockSize = 5)
    // Identity keys (the strings themselves) survive: exact dup pairs only.
    capped.filter("dist > 0").count() shouldBe 0L
    val uncapped = Fuzzy.editDistance1Join(tiny, "id", "s", maxBlockSize = 0)
    // Without the cap every distinct pair of letters is distance 1.
    uncapped.filter("dist > 0").count() should be > 0L
  }

  test("droppedBlocks audits exactly what the capped join silently lost") {
    import spark.implicits._
    // 30 one-char strings: all share the "" deletion key → one hot block
    val tiny = (1L to 30L).map(i => (i, ('a' + (i % 26).toInt).toChar.toString))
      .toDF("id", "s")
    val dropped = Fuzzy.droppedBlocks(tiny, "id", "s", maxBlockSize = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    dropped.map(_._1) should contain ("")
    dropped.foreach { case (_, n) => n should be > 10L }
    // generous cap: nothing dropped, guarantee unconditional
    Fuzzy.droppedBlocks(tiny, "id", "s", maxBlockSize = 1000)
      .count() shouldBe 0L
    // the cross-table audit counts combined frequency
    Fuzzy.droppedBlocksBetween(tiny, "id", "s", tiny, "id", "s",
      maxBlockSize = 35).collect().map(_.getString(0)) should contain ("")
    an[IllegalArgumentException] should be thrownBy
      Fuzzy.droppedBlocks(tiny, "id", "s", maxBlockSize = 0)
  }
}
