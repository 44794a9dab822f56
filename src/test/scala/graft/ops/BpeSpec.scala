package graft.ops

import graft.pipe.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def count(texts: (Long, String)*): Map[Long, Long] = {
    import spark.implicits._
    texts.toSeq.toDF("id", "text")
      .select($"id", Bpe.tokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("hand-computed merges (BPE-1 frozen order semantics)") {
    // "the": t+h -> th (rule 1), th+e -> the (rule 39) -> 1 token
    // "and": a+n -> an (rule 5), an+d -> and (rule 40) -> 1 token
    // "data": a+t -> at (rule 8, first occurrence only) -> d|at|a -> 3
    // "with": t+h fires FIRST (rule 1) -> w|i|th; the (i,t) rule can no
    //   longer apply, so the compound (w,it)/(wit,h) rules are no-ops
    //   -> 3 tokens (the frozen-order variant's documented behavior)
    val got = count(1L -> "the", 2L -> "and", 3L -> "data", 4L -> "with",
      5L -> "the and data with")
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 8L))
  }

  test("sanitization: separator bars and non-ASCII strip; empty words " +
    "drop; punctuation is kept as chars") {
    // "a|b" -> "ab" -> no (a,b) rule -> 2 tokens
    // "café" -> "caf" -> 3 tokens; "é" alone -> empty word, dropped
    // "the." -> t+h, th+e -> |the||.| -> 2 tokens
    val got = count(1L -> "a|b", 2L -> "café é", 3L -> "the.",
      4L -> "", 5L -> "   ")
    assert(got == Map(1L -> 2L, 2L -> 3L, 3L -> 2L, 4L -> 0L, 5L -> 0L))
  }

  test("subword counts are below char counts and track morphology") {
    import spark.implicits._
    val r = count(1L ->
      ("the running dogs and their friends were standing there " +
        "with the other things that mattered"))
    val n = r(1L)
    // 14 words, 85 letters: BPE lands between words and chars
    assert(n > 14 && n < 85, n)
  }

  test("merge-table content hash is pinned (the oracle literal)") {
    assert(Bpe.contentHash ==
      "237bd1c3f643e1f4d049297819a74a39aae842220b8d8b4c1a190fa39c904578")
    assert(Bpe.merges.length == 50)
  }

  test("graft_bpe_tokens SQL function matches the Column API") {
    val s = spark
    graft.functions.GraftOpFunctions.register(s)
    import s.implicits._
    Seq((1L, "the and data with")).toDF("id", "text")
      .createOrReplaceTempView("bpe_v")
    val viaSql = s.sql("SELECT graft_bpe_tokens(text) AS n FROM bpe_v")
      .collect()(0).getLong(0)
    assert(viaSql == 8L)
  }
}
