package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-substring corpus deduplication — the "any W-token span that
  * occurs more than once in the corpus is removed from every document
  * containing it" rule (Lee et al. 2021, "Deduplicating Training Data
  * Makes Language Models Better", §4.1: ExactSubstr with a 50-token
  * threshold). Complements the family's other granularities: whole-doc
  * (MinHashDedup), conversation (t_dedup_conv), line (LineDedup) —
  * this one catches verbatim passages embedded mid-document (quoted
  * boilerplate, licence blocks, syndicated paragraphs) that are
  * neither whole-doc near-dups nor line-aligned.
  *
  * Lee et al. build a corpus-wide suffix array — inherently
  * single-machine. The Spark-native shape used here is the windowed
  * fingerprint equivalent: every W-token window is hashed, a window
  * hash seen >= 2 times anywhere (including twice within one document,
  * matching the published semantics) marks all its occurrences, and
  * overlapping marked windows merge naturally because removal is
  * decided per TOKEN (covered-by-any-marked-window). This removes
  * exactly the maximal duplicated runs of length >= W; runs shorter
  * than W are below the threshold by definition.
  *
  * Scale shape:
  *  - window fingerprints are SUBSTR-1 rolling Karp-Rabin hashes
  *    (`graft_window_hashes`, O(n) per doc — not O(n*W) bytes of
  *    window text md5'd; at the paper's W=50 that is a ~50x saving on
  *    the hot pass) over two 31-bit primes — 62 bits, so a false
  *    duplicate (which would DELETE innocent text) stays vanishingly
  *    improbable at corpus scale.
  *  - the window pass shuffles (hash: long, doc_id, pos) — 3 narrow
  *    columns, never window text; the count is map-side combinable.
  *  - duplicated-window starts per doc collapse to ONE sorted int
  *    array in a single aggregation; the strip + reassembly is then a
  *    per-row expression (no window function, no second corpus-wide
  *    shuffle beyond the doc_id groupBy).
  *  - like every frequency-then-strip dedup, the corpus lineage is
  *    executed twice (count pass + strip pass); callers whose upstream
  *    is expensive (e.g. media decode) should persist the slim
  *    (doc_id, text) projection first — the Ann.lshTopK lesson.
  */
object ExactSubstr {

  /** corpus(doc_id: long, text: string, whitespace-tokenized) ->
    * (doc_id, n_tokens, n_removed, text_hash) where text_hash is md5
    * of the surviving tokens rejoined with ' ' in original order
    * (md5("") when the whole document was duplicated material).
    */
  def dedupSubstrings(spark: SparkSession, corpus: DataFrame,
      w: Int = 50): DataFrame = {
    require(w >= 2, "window below 2 tokens would remove every token")
    import spark.implicits._
    val toks = corpus.select($"doc_id",
      filter(split($"text", " "), t => t =!= "").as("ws"))
      .filter(size($"ws") >= 1)

    // one row per W-token window: (doc_id, 1-based start, hash) — the
    // only corpus-sized shuffle, and it carries 8-byte fingerprints,
    // not window text
    val wins = toks.filter(size($"ws") >= w)
      .select($"doc_id",
        posexplode(graft.functions.WindowHashes.windowHashes($"ws", w))
          .as(Seq("p0", "h")))
      .select($"doc_id", ($"p0" + 1).as("i"), $"h")

    // total occurrences >= 2 — within-doc repeats count, per Lee et al.
    val dup = wins.groupBy($"h")
      .agg(count(lit(1)).as("n")).filter($"n" >= 2).select($"h")

    val starts = wins.join(dup, "h")
      .groupBy($"doc_id")
      .agg(array_sort(collect_list($"i")).as("starts"))

    val s0 = coalesce($"starts", expr("cast(array() as array<int>)"))
    // merge the sorted starts into maximal covered runs BEFORE the
    // per-token test (native graft_covered_runs, O(|starts|)): a
    // heavily-duplicated doc has |starts| ~ n marked windows but only
    // r maximal runs (r = 1 when the whole doc is duplicated), so the
    // strip drops from O(n * |starts|) to O(n * r) — the worst case is
    // exactly the duplicated documents this operator exists to handle
    val runs = graft.functions.WindowHashes.coveredRuns(s0, w)
    // token j (0-based) is removed iff covered by any merged run
    // (runs pack (start << 32) | end, both 1-based inclusive)
    val kept = filter($"ws", (t, j) =>
      !exists(runs, r => shiftright(r, 32) <= (j + 1).cast("long") &&
        (j + 1).cast("long") <= r.bitwiseAND(lit(4294967295L))))

    toks.join(starts, Seq("doc_id"), "left")
      .select($"doc_id",
        size($"ws").cast("long").as("n_tokens"),
        (size($"ws") - size(kept)).cast("long").as("n_removed"),
        md5(array_join(kept, " ")).as("text_hash"))
  }
}
