package graft.functions

import graft.pipe.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class WindowHashesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tokenHash(t: String, p: Long): Long = {
    var a = 0L
    var j = 0
    while (j < t.length) {
      val cp = t.codePointAt(j)
      a = (a * 31 + cp) % p
      j += Character.charCount(cp)
    }
    a
  }

  /** The frozen SUBSTR-1 definition, refolded naively per window — the
    * oracle's formulation; the expression must match it exactly.
    */
  private def naive(toks: Seq[String], w: Int): Seq[Long] =
    (0 to toks.length - w).map { i =>
      def fold(p: Long) = toks.slice(i, i + w)
        .foldLeft(0L)((acc, t) => (acc * 1000003L + tokenHash(t, p)) % p)
      fold(1000000007L) * 2147483648L + fold(998244353L)
    }

  private def viaSpark(toks: Seq[String], w: Int): Seq[Long] = {
    import spark.implicits._
    Seq(toks).toDF("ws")
      .select(WindowHashes.windowHashes($"ws", w).as("h"))
      .collect()(0).getSeq[Long](0)
  }

  test("rolling update equals the naive per-window refold on " +
    "pseudo-random token streams (several lengths and windows)") {
    val rng = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "cθ", "dog", "xyzzy", "1", "", "héllo")
    for (n <- Seq(1, 5, 6, 7, 20, 101); w <- Seq(2, 6, 50)) {
      val toks = Seq.fill(n)(vocab(rng.nextInt(vocab.size)))
      assert(viaSpark(toks, w) == naive(toks, w),
        s"mismatch at n=$n w=$w")
    }
  }

  test("fewer tokens than the window yields an empty array; a null " +
    "token array yields null") {
    import spark.implicits._
    assert(viaSpark(Seq("a", "b"), 6).isEmpty)
    val r = Seq(Option.empty[Seq[String]]).toDF("ws")
      .select(WindowHashes.windowHashes($"ws", 2).as("h")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("coveredRuns merges sorted starts into maximal inclusive runs " +
    "(adjacent-coverage merge, gaps split, full-doc collapse)") {
    import spark.implicits._
    def runs(starts: Seq[Int], w: Int): Seq[(Long, Long)] =
      Seq(starts).toDF("s")
        .select(WindowHashes.coveredRuns($"s", w).as("r"))
        .collect()(0).getSeq[Long](0)
        .map(x => (x >> 32, x & 0xffffffffL))
    // [1..6] and [7..12] touch (7 <= 6+1) -> one run; 20 stands alone
    assert(runs(Seq(1, 7, 20), 6) == Seq((1L, 12L), (20L, 25L)))
    // overlapping chain collapses to one run
    assert(runs(1 to 95, 6) == Seq((1L, 100L)))
    // a gap of exactly one uncovered token splits runs ([1..6], [8..13])
    assert(runs(Seq(1, 8), 6) == Seq((1L, 6L), (8L, 13L)))
    assert(runs(Seq.empty, 6).isEmpty)
  }

  test("SQL surface: graft_window_hashes equals the Column API and " +
    "rejects a non-literal / too-small window at analysis time") {
    import spark.implicits._
    graft.functions.GraftOpFunctions.register(spark)
    val df = Seq(Seq("p", "q", "r", "s")).toDF("ws")
    df.createOrReplaceTempView("wh_in")
    val viaSql = spark.sql(
      "SELECT graft_window_hashes(ws, 2) AS h FROM wh_in")
      .collect()(0).getSeq[Long](0)
    assert(viaSql == naive(Seq("p", "q", "r", "s"), 2))
    val e = intercept[Exception] {
      spark.sql("SELECT graft_window_hashes(ws, 1) FROM wh_in").collect()
    }
    assert(e.getMessage.contains("window must be >= 2"))
  }
}
