package graft.ops

import graft.pipe.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class LineDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("removes lines in >= minDocs distinct docs, keeps rarer ones, " +
    "reassembles survivors in original order") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "footer line\nunique one\nshared pair"),
      (2L, "unique two\nfooter line\nshared pair"),
      (3L, "footer line\nunique three"),
      (4L, "solo doc")
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(spark, corpus, minDocs = 3)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // "footer line" is in 3 docs -> removed everywhere; "shared pair"
    // only in 2 -> survives
    assert(out(1L) == ((3L, 1L, md5hex("unique one\nshared pair"))))
    assert(out(2L) == ((3L, 1L, md5hex("unique two\nshared pair"))))
    assert(out(3L) == ((2L, 1L, md5hex("unique three"))))
    assert(out(4L) == ((1L, 0L, md5hex("solo doc"))))
  }

  test("a doc made entirely of boilerplate collapses to md5 of the " +
    "empty string, and repeats within ONE doc count once") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "banner\nbanner\nbanner"), // 3 copies, but ONE distinct doc
      (2L, "banner\nkeep me"),
      (3L, "banner")
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(spark, corpus, minDocs = 3)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // "banner" is in 3 distinct docs -> removed; doc 1 and doc 3 lose
    // everything (intra-doc repetition does not inflate the count past
    // what distinct-doc counting sees)
    assert(out(1L) == ((3L, 3L, md5hex(""))))
    assert(out(2L) == ((2L, 1L, md5hex("keep me"))))
    assert(out(3L) == ((1L, 1L, md5hex(""))))
  }

  test("below-threshold corpus is untouched (every doc keeps all " +
    "lines and hashes to its own text)") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b\nc d"),
      (2L, "a b\ne f")
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(spark, corpus, minDocs = 3)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((0L, md5hex("a b\nc d"))))
    assert(out(2L) == ((0L, md5hex("a b\ne f"))))
  }
}
