package graft.ops

import graft.pipe.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Reference implementation straight from the WINNOW-1 contract
    * wording: per-position fold hashes, explicit window minima, set
    * semantics — no rolling hash, no deque.
    */
  private def reference(text: String, k: Int, w: Int): Set[Long] = {
    val n = text.length
    val m = n - k + 1
    if (m <= 0) return Set.empty
    val hs = (0 until m).map { i =>
      text.substring(i, i + k).foldLeft(0L)((a, c) =>
        (a * Winnow.Base + c) % Winnow.Mod)
    }
    if (m <= w) Set(hs.min)
    else (0 to m - w).map(j => hs.slice(j, j + w).min).toSet
  }

  test("fingerprints match the direct-fold reference (rolling hash + " +
    "deque vs naive recompute) across sizes and boundaries") {
    val r = new java.util.Random(3)
    val alphabets = Seq("ab", "abcdefgh", "the quick brown fox ")
    for (len <- Seq(0, 5, 7, 8, 9, 23, 24, 40, 200, 1000);
         alpha <- alphabets) {
      val t = (0 until len).map(_ =>
        alpha(r.nextInt(alpha.length))).mkString
      assert(Winnow.fingerprints(t).toSet == reference(t, 8, 16),
        s"len=$len alpha=${alpha.take(4)}")
    }
  }

  test("locality guarantee: any shared substring of length >= w+k-1 " +
    "shares at least one fingerprint") {
    val r = new java.util.Random(9)
    def rand(n: Int) = (0 until n).map(_ =>
      ('a' + r.nextInt(26)).toChar).mkString
    for (_ <- 0 until 50) {
      val core = rand(23) // w + k - 1 = 16 + 8 - 1 = 23
      val a = rand(r.nextInt(100)) + core + rand(r.nextInt(100))
      val b = rand(r.nextInt(100)) + core + rand(r.nextInt(100))
      val shared = Winnow.fingerprints(a).toSet
        .intersect(Winnow.fingerprints(b).toSet)
      assert(shared.nonEmpty, s"no shared fp: core=$core")
    }
  }

  test("containment end to end: a document embedded in padding scores " +
    "high against its source; unrelated documents score nothing; the " +
    "fpCap drops boilerplate shared by many docs") {
    import spark.implicits._
    val r = new java.util.Random(21)
    def rand(n: Int) = (0 until n).map(_ =>
      ('a' + r.nextInt(26)).toChar).mkString + " "
    val base = (0L until 20L).map(id => (id, rand(30) * 8))
    val contained = base.take(5).map { case (id, t) =>
      (id + 100L, rand(20) + t + rand(20))
    }
    val corpus = spark.createDataset(base ++ contained).toDF("id", "text")
    val pairs = Winnow.containmentPairs(spark, corpus)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2)))
      .toMap
    for ((id, _) <- base.take(5)) {
      val sc = pairs.get((id, id + 100L))
      assert(sc.exists(_ >= 0.8), s"containment pair $id: $sc")
    }
    // unrelated base docs never pair
    assert(!pairs.keys.exists { case (a, b) => a < 100 && b < 100 },
      pairs.keys.toSeq.sorted.mkString(","))
    // boilerplate: the same header on EVERY doc is capped out — no
    // all-pairs explosion from shared chrome
    val chrome = "standard license header do not remove " * 2
    val noisy = (0L until 40L).map(id => (id, chrome + rand(40) * 4))
    val noisyPairs = Winnow.containmentPairs(spark,
      spark.createDataset(noisy).toDF("id", "text"), fpCap = 8)
      .collect()
    assert(noisyPairs.isEmpty,
      s"chrome produced ${noisyPairs.length} pairs")
  }

  test("incremental against a persisted index equals the inter-set " +
    "subset of the batch op on the union corpus") {
    import spark.implicits._
    val r = new java.util.Random(17)
    def rand(words: Int): String =
      (0 until words).map(_ => "abcdefgh"(r.nextInt(8)).toString * 3)
        .mkString(" ")
    val hist = (0L until 30L).map(id => (id, rand(30)))
    // new batch: 10 padded embeds of history docs + 5 fresh docs
    val batch = hist.take(10).map { case (id, t) =>
      (id + 1000L, "xx padding yy " + t + " zz tail ww")
    } ++ (1200L until 1205L).map(id => (id, rand(25)))
    val histDf = spark.createDataset(hist).toDF("id", "text")
    val batchDf = spark.createDataset(batch).toDF("id", "text")
    val union = spark.createDataset(hist ++ batch).toDF("id", "text")
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val inc = key(Winnow.containmentIncremental(spark,
      Winnow.fingerprintIndex(spark, histDf), batchDf).collect())
    val batchOp = key(Winnow.containmentPairs(spark, union).collect()
      .filter(x => x.getLong(0) < 1000 && x.getLong(1) >= 1000))
    assert(inc == batchOp && inc.size >= 10, s"inc=${inc.size}")
  }

  test("degenerate inputs: empty, shorter than k, exactly k, repeated " +
    "single char — no throw, deterministic") {
    assert(Winnow.fingerprints("").isEmpty)
    assert(Winnow.fingerprints("abc").isEmpty)
    assert(Winnow.fingerprints("abcdefgh").length == 1)
    val rep = Winnow.fingerprints("a" * 500)
    assert(rep.length == 1) // one distinct k-gram -> one fingerprint
    assert(Winnow.fingerprints("xyz" * 100).toSet ==
      Winnow.fingerprints("xyz" * 100).toSet)
  }
}
