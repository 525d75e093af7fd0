package graft.text

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("domainMixingReport computes token mass and corpus share per domain") {
    val docs = Seq(
      (1L, "a b c d", "web"), (2L, "e f", "web"),
      (3L, "g h i j k l", "books"))
      .toDF("doc_id", "text", "source")
    val out = Curation.domainMixingReport(docs, "source", "text")
      .orderBy("domain").collect()
    out.map(r => (r.getAs[String]("domain"), r.getAs[Long]("docs"),
      r.getAs[Long]("total_tokens"), r.getAs[Long]("tokens_per_doc_e6"),
      r.getAs[Long]("share_e6"))).toSeq shouldBe Seq(
      ("books", 1L, 6L, 6000000L, 500000L), // 6 of 12 tokens
      ("web", 2L, 6L, 3000000L, 500000L))
  }

  test("qualityFilter gates on token count, word length, ttr, repetition") {
    val docs = Seq(
      (1L, (1 to 30).map(i => s"tok$i").mkString(" ")), // passes every rule
      (2L, "too short"), // token_count
      (3L, (1 to 30).map(_ => "x").mkString(" ")), // len ok=1? no: awl=1 -> avg_token_len
      (4L, ("a b " * 20).trim)) // 40 tokens, ttr 2/40 -> ttr fires first? awl=1 fires first
      .toDF("doc_id", "text")
    val out = Curation.qualityFilter(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("passed"),
      r.getAs[String]("fail_reason"))).toSeq shouldBe Seq(
      (1L, true, ""),
      (2L, false, "token_count"),
      (3L, false, "avg_token_len"), // 1-char tokens: awl 1.0 < 3.0, checked before ttr
      (4L, false, "avg_token_len"))
    // signal columns ride along for filter-rate audits
    out.head.getAs[Long]("n_tokens") shouldBe 30L
    out.head.getAs[Long]("ttr_e6") shouldBe 1000000L
  }

  test("qualityFilter dup_2gram rule fires on repetitive long-word docs") {
    val docs = Seq((1L, ("alpha beta " * 15).trim)).toDF("doc_id", "text")
    val r = Curation.qualityFilter(docs, "doc_id", "text").head()
    // 30 tokens, awl 4.5 ok, but ttr 2/30 fails before dup_2gram
    r.getAs[String]("fail_reason") shouldBe "ttr"
    // relax ttr -> dup_2gram (29 bigrams, 2 distinct) is the verdict
    val r2 = Curation.qualityFilter(docs, "doc_id", "text", minTtrE6 = 0L).head()
    r2.getAs[Boolean]("passed") shouldBe false
    r2.getAs[String]("fail_reason") shouldBe "dup_2gram"
  }
}
