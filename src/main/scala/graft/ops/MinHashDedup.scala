package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection: word-shingling -> MinHash signatures ->
  * LSH banding -> bucket join -> EXACT Jaccard verification.
  *
  * Scale design (the point at 100 TB):
  *  - signatures are computed in one narrow pass (mapPartitions-free:
  *    a deterministic UDF-less path would need a custom Expression; we
  *    use a typed map once per doc, not per shingle row);
  *  - candidate generation shuffles only (band_idx, band_hash, id) —
  *    slim rows — and self-joins within buckets, never the corpus;
  *  - buckets larger than `bucketCap` are dropped with a count (they are
  *    degenerate content; the cap bounds the quadratic blowup the same
  *    way the reference caps retry loops, page_cropping.py:266);
  *  - exact verification joins text back only for candidate pairs
  *    (tiny vs corpus) and is the final arbiter: LSH affects recall
  *    only, never precision.
  *
  * Determinism: hash mixing is SplitMix64-style from a fixed seed — no
  * randomness at runtime (vkit's SeedSequence contract,
  * vkit/utility/pool.py:86-96).
  */
object MinHashDedup {

  /** 64-bit mix (SplitMix64 finalizer). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def hashString(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** Char n-grams as 64-bit hashes (set semantics) — the n-gram
    * Jaccard flavor of near-dup detection.
    */
  def charNgrams(text: String, n: Int): Set[Long] = {
    if (text.length < n) {
      if (text.isEmpty) Set.empty else Set(hashString(text))
    } else {
      val out = Set.newBuilder[Long]
      var i = 0
      while (i + n <= text.length) {
        out += hashString(text.substring(i, i + n))
        i += 1
      }
      out.result()
    }
  }

  /** Word k-shingles as 64-bit hashes (set semantics). */
  def shingles(text: String, k: Int): Set[Long] = {
    val ws = text.split(' ').filter(_.nonEmpty)
    if (ws.length < k) {
      if (ws.isEmpty) Set.empty else Set(hashString(ws.mkString(" ")))
    } else
      (0 to ws.length - k).map(i =>
        hashString(ws.slice(i, i + k).mkString(" "))).toSet
  }

  /** MinHash signature: perm i = min over shingles of mix64(h ^ seed_i). */
  def signature(sh: Set[Long], numPerm: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    for (h <- sh) {
      var i = 0
      while (i < numPerm) {
        val v = mix64(h ^ mix64(seed + i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  def exactJaccard(a: Set[Long], b: Set[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val inter = a.intersect(b).size
    inter.toDouble / (a.size + b.size - inter)
  }

  /** Candidate pairs with exact Jaccard >= threshold.
    *
    * Input: (id: Long, text: String). Output: (id_a, id_b, jaccard)
    * with id_a < id_b, jaccard rounded to 4 decimals for cross-engine
    * comparability.
    */
  def nearDuplicates(spark: SparkSession, docs: Dataset[(Long, String)],
      shingleK: Int = 3, numPerm: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, bucketCap: Int = 64,
      shingler: String => Set[Long] = null): DataFrame = {
    import spark.implicits._
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rows = numPerm / bands
    val seed = 42L
    val mk: String => Set[Long] =
      if (shingler != null) shingler else shingles(_, shingleK)

    // (band_idx, band_hash, id) — slim shuffle rows
    val bandRows = docs.flatMap { case (id, text) =>
      val sig = signature(mk(text), numPerm, seed)
      (0 until bands).iterator.map { b =>
        var h = 0xCBF29CE484222325L
        var i = b * rows
        while (i < (b + 1) * rows) { h = mix64(h ^ sig(i)); i += 1 }
        (b, h, id)
      }
    }.toDF("band", "bh", "id")

    val buckets = bandRows.groupBy($"band", $"bh")
      .agg(collect_list($"id").as("ids"))
      .filter(size($"ids") > 1 && size($"ids") <= bucketCap)

    val pairs = buckets.select(explode(expr(
      """filter(
           flatten(transform(ids, (x, i) ->
             transform(slice(ids, i + 2, size(ids)), y ->
               struct(least(x, y) AS a, greatest(x, y) AS b)))),
           p -> p.a <> p.b)""")).as("p"))
      .select($"p.a".as("id_a"), $"p.b".as("id_b"))
      .distinct()

    // exact verification: join shingle sets back for candidates only
    val sh = docs.map { case (id, text) =>
      (id, mk(text).toSeq)
    }.toDF("id", "sh")

    pairs
      .join(sh.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sh", "sh_b"), "id_b")
      .select($"id_a", $"id_b", $"sh_a", $"sh_b")
      .as[(Long, Long, Seq[Long], Seq[Long])]
      .map { case (a, b, shA, shB) =>
        (a, b, exactJaccard(shA.toSet, shB.toSet))
      }
      .toDF("id_a", "id_b", "jaccard")
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))
  }
}
