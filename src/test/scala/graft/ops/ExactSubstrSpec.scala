package graft.ops

import graft.pipe.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ExactSubstrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def run(corpus: Seq[(Long, String)], w: Int)
      : Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    ExactSubstr.dedupSubstrings(spark, corpus.toDF("doc_id", "text"), w)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("a W-token span shared by two docs is stripped from both; " +
    "surrounding unique text survives in order") {
    val shared = "one two three four five six"
    val out = run(Seq(
      (1L, s"alpha $shared omega"),
      (2L, s"beta gamma $shared"),
      (3L, "delta epsilon zeta")), w = 6)
    // doc 1: tokens 2..7 covered; straddling windows (1..6, 3..8) are
    // unique per doc and mark nothing
    assert(out(1L) == ((8L, 6L, md5hex("alpha omega"))))
    assert(out(2L) == ((8L, 6L, md5hex("beta gamma"))))
    assert(out(3L) == ((3L, 0L, md5hex("delta epsilon zeta"))))
  }

  test("a span repeated WITHIN one doc counts as two occurrences " +
    "(published ExactSubstr semantics) and both copies are removed") {
    val out = run(Seq((1L, "a b c d e f a b c d e f x")), w = 6)
    // windows at 1 and 7 are equal -> both marked -> tokens 1..12 gone
    assert(out(1L) == ((13L, 12L, md5hex("x"))))
  }

  test("overlapping duplicated windows merge into one maximal run " +
    "(a W+1-token shared span removes W+1 tokens, not 2W)") {
    val shared = "p q r s t u v" // 7 tokens, W=6 -> 2 overlapping windows
    val out = run(Seq(
      (1L, s"head $shared"),
      (2L, s"$shared tail")), w = 6)
    assert(out(1L) == ((8L, 7L, md5hex("head"))))
    assert(out(2L) == ((8L, 7L, md5hex("tail"))))
  }

  test("a long fully-duplicated doc (every window marked) collapses " +
    "cleanly — the merged-run path, |starts| ~ n but one run") {
    val big = (1 to 200).map(i => s"v$i").mkString(" ")
    val out = run(Seq((1L, big), (2L, big), (3L, "lone words here")),
      w = 6)
    assert(out(1L) == ((200L, 200L, md5hex(""))))
    assert(out(2L) == ((200L, 200L, md5hex(""))))
    assert(out(3L) == ((3L, 0L, md5hex("lone words here"))))
  }

  test("docs shorter than W and duplicate-free corpora are untouched; " +
    "a fully-duplicated doc hashes to md5 of the empty string") {
    val out = run(Seq(
      (1L, "tiny doc"),
      (2L, "g h i j k l"),
      (3L, "g h i j k l")), w = 6)
    assert(out(1L) == ((2L, 0L, md5hex("tiny doc"))))
    assert(out(2L) == ((6L, 6L, md5hex(""))))
    assert(out(3L) == ((6L, 6L, md5hex(""))))
  }
}
