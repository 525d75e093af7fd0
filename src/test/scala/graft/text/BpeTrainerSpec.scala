package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** BPE vocabulary induction: reference-implementation parity on a
  * hand-computed corpus, leftmost-non-overlapping run semantics, the
  * merge-tie total order, partition-order independence, early stop, and
  * train/apply consistency. */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def merges(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4)))

  test("learnMerges reproduces the hand-computed merge sequence") {
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3  — the
    // Sennrich paper's worked example. Pair counts round 1:
    // es: 6+3=9, st: 9, ne/ew/we: 6, wi/id/de: 3, lo/ow: 7, er: 2 …
    // argmax ties (es, st) at 9 → tie order picks 'es' (e < s).
    val docs = Seq(
      ("low " * 5) + ("lower " * 2),
      ("newest " * 6) + ("widest " * 3)
    ).toDF("text")
    val got = merges(BpeTrainer.learnMerges(docs, "text", 4)
      .orderBy("merge_round").collect())
    got(0) shouldBe (1, "e", "s", "es", 9L)
    got(1) shouldBe (2, "es", "t", "est", 9L)
    // after es+est: ne/ew/we 6, lo/ow 7 → lo vs ow tie at 7 → lo
    got(2) shouldBe (3, "l", "o", "lo", 7L)
    got(3) shouldBe (4, "lo", "w", "low", 7L)
  }

  test("run merges are leftmost non-overlapping (aaaa -> aa aa)") {
    // 'aaaa' x3 and 'aaa' x2: round 1 argmax is (a,a) with 3*3 + 2*2 = 13
    // (every adjacent position counts). After merging, 'aaaa' = [aa][aa]
    // and 'aaa' = [aa][a], so round 2 counts (aa,aa)=3 and (aa,a)=2.
    val docs = Seq(("aaaa " * 3) + ("aaa " * 2)).toDF("text")
    val got = merges(BpeTrainer.learnMerges(docs, "text", 2)
      .orderBy("merge_round").collect())
    got(0) shouldBe (1, "a", "a", "aa", 13L)
    got(1) shouldBe (2, "aa", "aa", "aaaa", 3L)
  }

  test("merge sequence is independent of input partitioning") {
    val docs = graft.tables.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").select("text")
    val a = merges(BpeTrainer.learnMerges(docs.repartition(1), "text", 6)
      .orderBy("merge_round").collect())
    val b = merges(BpeTrainer.learnMerges(
      docs.repartition(7, col("text")), "text", 6)
      .orderBy("merge_round").collect())
    a shouldBe b
    a should have length 6
  }

  test("stops early when the best pair falls below minPairCount") {
    // every word distinct, every pair count 1 → zero merges at the
    // default minPairCount = 2
    val docs = Seq("ab cd ef").toDF("text")
    BpeTrainer.learnMerges(docs, "text", 5).count() shouldBe 0L
    // with minPairCount = 1 it merges (deterministic tie: a < c < e)
    val got = merges(BpeTrainer.learnMerges(docs, "text", 2, minPairCount = 1L)
      .orderBy("merge_round").collect())
    got(0) shouldBe (1, "a", "b", "ab", 1L)
  }

  test("applyMerges segments words exactly as training left them") {
    val docs = Seq(("low " * 5) + ("lower " * 2) + ("newest " * 6) +
      ("widest " * 3)).toDF("text")
    val learned = BpeTrainer.learnMerges(docs, "text", 4)
      .orderBy("merge_round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val pieces = Seq("low", "lower", "newest", "widest", "lowest")
      .toDF("word")
      .select(col("word"), BpeTrainer.applyMerges(col("word"), learned).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    pieces("low") shouldBe Seq("low")
    pieces("lower") shouldBe Seq("low", "e", "r")
    pieces("newest") shouldBe Seq("n", "e", "w", "est")
    pieces("widest") shouldBe Seq("w", "i", "d", "est")
    // an unseen word segments with the learned vocab too
    pieces("lowest") shouldBe Seq("low", "est")
  }
}
