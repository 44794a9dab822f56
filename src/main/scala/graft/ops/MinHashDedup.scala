package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection: word-shingling -> MinHash signatures ->
  * LSH banding -> bucket join -> EXACT Jaccard verification.
  *
  * Scale design (the point at 100 TB):
  *  - signatures are computed in one narrow pass (a typed map once per
  *    doc, not per shingle row);
  *  - candidate generation shuffles only (band_idx, band_hash, id) —
  *    slim rows — and self-joins within buckets, never the corpus;
  *  - bucket sizes are measured FIRST with a count-only aggregation
  *    (constant memory per group); buckets larger than `bucketCap` are
  *    pruned BEFORE any collect_list materializes them, so a degenerate
  *    bucket (millions of near-empty docs sharing a band hash) never
  *    builds a multi-million-element aggregation buffer. Dropped buckets
  *    are observable via `oversizedBuckets` (same inputs -> the pruned
  *    (band, bh, n) keys) for lineage/recall accounting;
  *  - exact verification recomputes shingles ONLY for docs that appear
  *    in a candidate pair (semi-join on id), so corpus-wide shingle
  *    sets (~8x text size for char-8-grams) never shuffle;
  *  - exact Jaccard is the final arbiter: LSH affects recall only,
  *    never precision.
  *
  * Degenerate-input rule (mirrored by the DuckDB oracles): a doc with
  * fewer than k tokens (word shingles) or fewer than n chars (char
  * n-grams) has NO shingles and never enters banding or pairing.
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
    * Jaccard flavor of near-dup detection. Texts shorter than n have
    * no shingles (degenerate-input rule). The FNV fold runs directly
    * over the char window — same value as hashString(substring) with
    * zero per-position String allocations (one hash per CHARACTER
    * position makes this the hottest shingler; guide §1.2 step 2).
    */
  def charNgrams(text: String, n: Int): Set[Long] = {
    if (text.length < n) Set.empty
    else {
      val out = Set.newBuilder[Long]
      var i = 0
      while (i + n <= text.length) {
        var h = 0xCBF29CE484222325L
        var j = i
        val end = i + n
        while (j < end) {
          h ^= text.charAt(j)
          h *= 0x100000001B3L
          j += 1
        }
        out += h
        i += 1
      }
      out.result()
    }
  }

  /** Word k-shingles as 64-bit hashes (set semantics). Texts with fewer
    * than k (non-empty) tokens have no shingles (degenerate-input rule).
    * The FNV fold runs word-by-word with the ' ' separator folded in
    * between — the same value as hashString(slice.mkString(" ")) with
    * no per-position slice/joined-string allocations (this hash runs
    * once per token position on every corpus pass; guide step 2).
    */
  def shingles(text: String, k: Int): Set[Long] = {
    val ws = text.split(' ').filter(_.nonEmpty)
    if (ws.length < k) Set.empty
    else {
      val out = Set.newBuilder[Long]
      var i = 0
      while (i + k <= ws.length) {
        var h = 0xCBF29CE484222325L
        var wi = i
        while (wi < i + k) {
          if (wi > i) {
            h ^= ' '
            h *= 0x100000001B3L
          }
          val w = ws(wi)
          var j = 0
          while (j < w.length) {
            h ^= w.charAt(j)
            h *= 0x100000001B3L
            j += 1
          }
          wi += 1
        }
        out += h
        i += 1
      }
      out.result()
    }
  }

  /** MinHash signature: perm i = min over shingles of mix64(h ^ seed_i).
    * seed_i = mix64(seed + i) is hoisted out of the shingle loop — the
    * previous form recomputed it per (shingle, perm), doubling the
    * mix64 count of the hottest inner loop in every near-dup pass.
    */
  def signature(sh: Set[Long], numPerm: Int, seed: Long): Array[Long] = {
    val seeds = Array.tabulate(numPerm)(i => mix64(seed + i))
    val sig = Array.fill(numPerm)(Long.MaxValue)
    for (h <- sh) {
      var i = 0
      while (i < numPerm) {
        val v = mix64(h ^ seeds(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Signature over a primitive shingle array (distinctness assumed —
    * a duplicate element cannot change a min anyway). Same values as
    * signature(Set); the array path is what the engine's hot loops use
    * (an immutable Set[Long] boxes every element and its iteration
    * dominates the signing pass at scale).
    */
  private[ops] def signatureArr(sh: Array[Long], numPerm: Int,
      seed: Long): Array[Long] = {
    val seeds = Array.tabulate(numPerm)(i => mix64(seed + i))
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var j = 0
    while (j < sh.length) {
      val h = sh(j)
      var i = 0
      while (i < numPerm) {
        val v = mix64(h ^ seeds(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  /** Sort a(0..n-1) and keep distinct values — the primitive-array
    * replacement for building a Set (identical value SET, no boxing).
    */
  private[ops] def sortedDistinct(a: Array[Long], n: Int): Array[Long] = {
    if (n == 0) return Array.emptyLongArray
    java.util.Arrays.sort(a, 0, n)
    var w = 1
    var i = 1
    while (i < n) {
      if (a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(a, w)
  }

  /** Allocation/boxing-free twin of shingles(): SORTED-DISTINCT word
    * k-shingle hashes as a primitive array (same FNV values).
    */
  private[ops] def shinglesArr(text: String, k: Int): Array[Long] = {
    val ws = text.split(' ').filter(_.nonEmpty)
    if (ws.length < k) return Array.emptyLongArray
    val out = new Array[Long](ws.length - k + 1)
    var i = 0
    while (i + k <= ws.length) {
      var h = 0xCBF29CE484222325L
      var wi = i
      while (wi < i + k) {
        if (wi > i) {
          h ^= ' '
          h *= 0x100000001B3L
        }
        val w = ws(wi)
        var j = 0
        while (j < w.length) {
          h ^= w.charAt(j)
          h *= 0x100000001B3L
          j += 1
        }
        wi += 1
      }
      out(i) = h
      i += 1
    }
    sortedDistinct(out, out.length)
  }

  /** Allocation/boxing-free twin of charNgrams(): SORTED-DISTINCT char
    * n-gram hashes as a primitive array (same FNV values).
    */
  private[ops] def charNgramsArr(text: String, n: Int): Array[Long] = {
    if (text.length < n) return Array.emptyLongArray
    val m = text.length - n + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0xCBF29CE484222325L
      var j = i
      val end = i + n
      while (j < end) {
        h ^= text.charAt(j)
        h *= 0x100000001B3L
        j += 1
      }
      out(i) = h
      i += 1
    }
    sortedDistinct(out, m)
  }

  def exactJaccard(a: Set[Long], b: Set[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val inter = a.intersect(b).size
    inter.toDouble / (a.size + b.size - inter)
  }

  /** Exact Jaccard by linear merge over SORTED distinct-element arrays
    * — the per-pair verify path. A doc appearing in P candidate pairs
    * pays its O(n log n) sort ONCE (in the `sh` stage below) and each
    * pair intersects in O(n) by merge; the previous form rebuilt a
    * hash Set from the shingle Seq once per PAIR row, avoidable
    * constant-factor work that compounds on hot duplicate clusters
    * (bucketCap bounds pairs per bucket but not across bands).
    */
  def jaccardSorted(a: IndexedSeq[Long], b: IndexedSeq[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i)
      val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** (band_idx, band_hash, id) rows — slim shuffle keys; docs with no
    * shingles emit nothing.
    */
  private def bandRows(spark: SparkSession, docs: Dataset[(Long, String)],
      mk: String => Array[Long], numPerm: Int, bands: Int,
      seed: Long): DataFrame = {
    import spark.implicits._
    val rows = numPerm / bands
    docs.flatMap { case (id, text) =>
      val sh = mk(text)
      if (sh.isEmpty) Iterator.empty
      else {
        val sig = signatureArr(sh, numPerm, seed)
        (0 until bands).iterator.map { b =>
          var h = 0xCBF29CE484222325L
          var i = b * rows
          while (i < (b + 1) * rows) { h = mix64(h ^ sig(i)); i += 1 }
          (b, h, id)
        }
      }
    }.toDF("band", "bh", "id")
  }

  /** Resolve to the SORTED-DISTINCT primitive-array shingler the hot
    * loops run on: a caller-supplied Set shingler is adapted (same
    * value set — min-signatures and sorted-merge jaccard are container-
    * agnostic), the defaults use the allocation-free array twins.
    * Well-known Set shinglers are rebound to their array twins so the
    * public API keeps its shape while the hot path stays unboxed.
    */
  private def resolveShingler(shingler: String => Set[Long],
      shingleK: Int): String => Array[Long] =
    if (shingler != null) { s =>
      val a = shingler(s).toArray
      java.util.Arrays.sort(a)
      a
    }
    else shinglesArr(_, shingleK)

  /** Char-n-gram array shingler for nearDuplicates' `shinglerArr`
    * param — the boxing-free form of `charNgrams(_, n)`.
    */
  def charNgramShingler(n: Int): String => Array[Long] =
    charNgramsArr(_, n)

  /** Repartition a corpus to the session's default parallelism when its
    * scan is NARROWER than that — the guide §2.5 input-skew rule (one
    * small unsplittable file -> one task) applied to the CPU-heavy
    * shingle/signature flatMaps: a single-file corpus otherwise runs
    * the whole signing pass on one or two cores while 30 sit idle. At
    * production scale the scan has >= cores splits and this is a no-op
    * (the condition, not the repartition, is what makes it scale-safe).
    */
  private[ops] def spreadIfNarrow[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions < p) ds.repartition(p) else ds
  }

  /** Persistable band INDEX of a corpus: the slim (band, bh, id) rows
    * the candidate stage joins on, exposed so an incremental pipeline
    * computes them ONCE per corpus snapshot and writes them to a
    * table. At 100 TB this is the difference between re-scanning and
    * re-signing the whole history for every arriving batch and
    * reading back a bands-x-|corpus|-row index of 20-byte rows.
    * Parameters must match the later `nearDuplicatesIncremental` call
    * (same shingler/numPerm/bands — the signature scheme IS the index
    * format).
    */
  def bandIndex(spark: SparkSession, docs: Dataset[(Long, String)],
      shingleK: Int = 3, numPerm: Int = 64, bands: Int = 16,
      shingler: String => Set[Long] = null): DataFrame =
    bandRows(spark, docs, resolveShingler(shingler, shingleK),
      numPerm, bands, 42L)

  /** Incremental near-dup: a NEW batch against a HISTORICAL corpus via
    * its persisted band index — the daily-crawl-vs-history shape.
    * Only the new batch is shingled and signed; history contributes
    * its stored index rows, and historical TEXT is fetched only for
    * candidate ids (left-semi pushdown into `oldDocs`), never scanned
    * wholesale. Old buckets larger than `bucketCap` are pruned (the
    * degenerate-history rule, same as nearDuplicates).
    * Output: (old_id, new_id, jaccard >= threshold), exact-verified.
    */
  def nearDuplicatesIncremental(spark: SparkSession,
      oldIndex: DataFrame, oldDocs: Dataset[(Long, String)],
      newDocs: Dataset[(Long, String)], shingleK: Int = 3,
      numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.8,
      bucketCap: Int = 64,
      shingler: String => Set[Long] = null): DataFrame = {
    import spark.implicits._
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val mk = resolveShingler(shingler, shingleK)
    val newSpread = spreadIfNarrow(newDocs)
    val newBands = bandRows(spark, newSpread, mk, numPerm, bands, 42L)
    val keptOld = oldIndex
      .join(oldIndex.groupBy($"band", $"bh")
          .agg(count(lit(1)).as("n"))
          .filter($"n" <= bucketCap).select($"band", $"bh"),
        Seq("band", "bh"))
      .withColumnRenamed("id", "old_id")
    // candidate pairs feed THREE consumers (both semi-joins + the final
    // verify join); materialize the slim id pairs once so the bucket
    // join + distinct does not re-execute per consumer
    val pairs = keptOld
      .join(newBands.withColumnRenamed("id", "new_id"),
        Seq("band", "bh"))
      .select($"old_id", $"new_id")
      .distinct()
      .localCheckpoint()
    def sortedShingles(docs: Dataset[(Long, String)],
        ids: DataFrame): DataFrame =
      spreadIfNarrow(docs).toDF("id", "text")
        .join(ids, Seq("id"), "left_semi")
        .as[(Long, String)]
        .map { case (id, text) => (id, mk(text).toSeq) }
        .toDF("id", "sh")
    val shOld = sortedShingles(oldDocs,
      pairs.select($"old_id".as("id")))
    val shNew = sortedShingles(newDocs,
      pairs.select($"new_id".as("id")))
    pairs
      .join(shOld.withColumnRenamed("id", "old_id")
        .withColumnRenamed("sh", "sh_a"), "old_id")
      .join(shNew.withColumnRenamed("id", "new_id")
        .withColumnRenamed("sh", "sh_b"), "new_id")
      .select($"old_id", $"new_id", $"sh_a", $"sh_b")
      .as[(Long, Long, Seq[Long], Seq[Long])]
      .map { case (a, b, shA, shB) =>
        (a, b, jaccardSorted(shA.toIndexedSeq, shB.toIndexedSeq))
      }
      .toDF("old_id", "new_id", "jaccard")
      .filter($"jaccard" >= threshold)
      .select($"old_id", $"new_id", round($"jaccard", 4).as("jaccard"))
  }

  /** Attach the single-pass recall ledger to a bucket-count DataFrame:
    * the SAME count aggregation that prunes degenerate buckets also
    * observes how many buckets/rows the cap dropped, so production runs
    * get recall-loss accounting for free (no second signature pass).
    * Read `ledger.get` after the first action on the returned plan:
    * keys `dropped_buckets`, `dropped_rows`.
    *
    * Caveat (verified behavior on Spark 4): if NO bucket survives the
    * prune (zero candidate buckets at all), AQE's empty-relation
    * propagation replaces the downstream join — including this metrics
    * node — with an empty relation, and `ledger.get` returns an EMPTY
    * map rather than zeros. Semantics for callers: a populated map is
    * the exact drop count; an empty map means "no kept buckets" —
    * consult `oversizedBuckets` for the breakdown in that (degenerate,
    * result-set-empty-anyway) case.
    */
  private[ops] def observeDrops(counts: DataFrame, bucketCap: Int,
      ledger: Observation): DataFrame = {
    import counts.sparkSession.implicits._
    if (ledger == null) counts
    else counts.observe(ledger,
      count(when($"n" > bucketCap, lit(1))).alias("dropped_buckets"),
      coalesce(sum(when($"n" > bucketCap, $"n")), lit(0L))
        .alias("dropped_rows"))
  }

  /** Buckets pruned by the cap, i.e. (band, bh, n) with n > bucketCap —
    * the recall-loss ledger for degenerate content. Count/inspect this
    * alongside `nearDuplicates` on the same inputs.
    */
  def oversizedBuckets(spark: SparkSession, docs: Dataset[(Long, String)],
      shingleK: Int = 3, numPerm: Int = 64, bands: Int = 16,
      bucketCap: Int = 64,
      shingler: String => Set[Long] = null): DataFrame = {
    import spark.implicits._
    bandRows(spark, docs, resolveShingler(shingler, shingleK),
      numPerm, bands, 42L)
      .groupBy($"band", $"bh").agg(count(lit(1)).as("n"))
      .filter($"n" > bucketCap)
  }

  /** Candidate pairs with exact Jaccard >= threshold.
    *
    * Input: (id: Long, text: String). Output: (id_a, id_b, jaccard)
    * with id_a < id_b, jaccard rounded to 4 decimals for cross-engine
    * comparability. `shinglerArr` is the boxing-free custom-shingler
    * form (MUST return SORTED-DISTINCT hashes — charNgramShingler
    * does); `shingler` (Set) remains for compatibility and is adapted.
    */
  def nearDuplicates(spark: SparkSession, docs: Dataset[(Long, String)],
      shingleK: Int = 3, numPerm: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, bucketCap: Int = 64,
      shingler: String => Set[Long] = null,
      ledger: Observation = null,
      shinglerArr: String => Array[Long] = null): DataFrame = {
    import spark.implicits._
    require(numPerm % bands == 0, "numPerm must divide into bands")
    require(shingler == null || shinglerArr == null,
      "pass shingler OR shinglerArr, not both")
    val seed = 42L
    val mk =
      if (shinglerArr != null) shinglerArr
      else resolveShingler(shingler, shingleK)

    // band rows are consumed TWICE (bucket-count pass + bucket join);
    // without materialization the shingle+signature flatMap — the
    // CPU-dominant stage of the whole operator — re-executes per
    // consumer. localCheckpoint keeps only the slim ~20-byte
    // (band, bh, id) rows (the Ann.materializeSlim discipline; a
    // production run persists bandIndex to a table instead). The
    // corpus is spread first so the signing pass uses every core.
    val docsSpread = spreadIfNarrow(docs)
    val bandsDf = bandRows(spark, docsSpread, mk, numPerm, bands, seed)
      .localCheckpoint()

    // count pass first: a degenerate bucket is pruned as one (band, bh,
    // n) row, never materialized as a list; `ledger` (if given) observes
    // the dropped bucket/row counts on this same pass — recall loss is
    // visible without re-running the signature stage
    val keptKeys = observeDrops(
      bandsDf.groupBy($"band", $"bh").agg(count(lit(1)).as("n")),
      bucketCap, ledger)
      .filter($"n" > 1 && $"n" <= bucketCap)
      .select($"band", $"bh")

    val buckets = bandsDf.join(keptKeys, Seq("band", "bh"))
      .groupBy($"band", $"bh")
      .agg(collect_list($"id").as("ids")) // size bounded by bucketCap

    val pairs = buckets.select(explode(expr(
      """filter(
           flatten(transform(ids, (x, i) ->
             transform(slice(ids, i + 2, size(ids)), y ->
               struct(least(x, y) AS a, greatest(x, y) AS b)))),
           p -> p.a <> p.b)""")).as("p"))
      .select($"p.a".as("id_a"), $"p.b".as("id_b"))
      .distinct()

    // exact verification: recompute shingles ONLY for candidate docs
    // (semi-join on id; AQE broadcasts the candidate set when small),
    // so corpus-wide shingle sets never shuffle
    // no .distinct() — the left_semi probe side needs no dedup, and
    // skipping it saves a whole shuffle stage
    val candIds = pairs
      .select(explode(array($"id_a", $"id_b")).as("id"))
    // shingle arrays are SORTED once per doc here, so the per-pair
    // verify below is a linear merge (see jaccardSorted); the spread
    // corpus keeps candidate re-shingling parallel on narrow scans.
    // NOT localCheckpointed despite two consumers (id_a/id_b joins):
    // measured +3 AQE jobs and no CPU win across the whole minhash
    // family — the broadcast semi-join re-execution is cheaper than
    // the extra materialization (the t_kmv_merge lesson again)
    val sh = docsSpread.toDF("id", "text")
      .join(candIds, Seq("id"), "left_semi")
      .as[(Long, String)]
      .map { case (id, text) => (id, mk(text).toSeq) }
      .toDF("id", "sh")

    pairs
      .join(sh.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sh", "sh_b"), "id_b")
      .select($"id_a", $"id_b", $"sh_a", $"sh_b")
      .as[(Long, Long, Seq[Long], Seq[Long])]
      .map { case (a, b, shA, shB) =>
        (a, b, jaccardSorted(shA.toIndexedSeq, shB.toIndexedSeq))
      }
      .toDF("id_a", "id_b", "jaccard")
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))
  }
}
