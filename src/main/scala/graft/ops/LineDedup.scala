package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Line-level corpus deduplication — the C4 / RefinedWeb boilerplate
  * rule: a LINE that recurs across many distinct documents (nav bars,
  * cookie banners, "subscribe" calls, copyright footers) is template
  * boilerplate and is removed from EVERY document containing it, then
  * each document is reassembled from its surviving lines in original
  * order. Published staples: C4 removed any three-sentence span
  * occurring more than once (Raffel et al. 2020 §2.2); RefinedWeb /
  * MassiveText run exactly this line-frequency rule (Penedo et al.
  * 2023 §3.3, Rae et al. 2021 A.1.2). Whole-document dedup
  * (MinHashDedup) misses this entirely: two documents sharing a
  * footer are nowhere near jaccard-duplicate, yet a 100 TB crawl's
  * token mass is dominated by such repeated template lines.
  *
  * Scale shape:
  *  - line frequency is counted on DISTINCT (md5(line), doc_id) pairs
  *    — a map-side-combinable aggregation whose cells are 2 narrow
  *    columns; line text never enters the frequency shuffle.
  *  - the frequent-line set (count >= minDocs) is tiny BY CONSTRUCTION
  *    (only template lines survive the threshold), so the anti-join
  *    that strips them is broadcast-sized; AQE converts it.
  *  - reassembly is ONE aggregation per doc (array_sort over
  *    (pos, line) structs) — no window, no second shuffle of the
  *    corpus beyond the doc_id groupBy.
  *
  * Determinism: positions are explode ordinals, the md5 hash is
  * deterministic, and the output pins content with md5 of the
  * '\n'-rejoined survivor text — the DuckDB oracle recomputes the
  * whole chain exactly.
  */
object LineDedup {

  /** corpus(doc_id: long, text: string multi-line) ->
    * (doc_id, n_lines, n_removed, text_hash) where text_hash is
    * md5 of the kept lines rejoined with '\n' (md5("") when every
    * line was boilerplate). Lines are compared verbatim (no
    * normalization) — normalization is the caller's composition
    * concern, as in the reference's staged pipelines.
    */
  def dedupLines(spark: SparkSession, corpus: DataFrame,
      minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would remove every line")
    import spark.implicits._
    val lines = corpus.select($"doc_id",
      posexplode(split($"text", "\n")).as(Seq("pos", "line")))

    // distinct (hash, doc) pairs -> per-line distinct-document counts;
    // only cells, never line text, move through this aggregation
    val frequent = lines
      .select(md5($"line").as("h"), $"doc_id").distinct()
      .groupBy($"h").agg(count(lit(1)).as("n_docs"))
      .filter($"n_docs" >= minDocs)
      .select($"h")

    val kept = lines.join(frequent,
      md5(lines("line")) === frequent("h"), "left_anti")

    val keptAgg = kept.groupBy($"doc_id").agg(
      count(lit(1)).as("n_kept"),
      md5(array_join(
        transform(array_sort(collect_list(struct($"pos", $"line"))),
          r => r("line")),
        "\n")).as("kept_hash"))

    lines.groupBy($"doc_id").agg(count(lit(1)).as("n_lines"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select($"doc_id", $"n_lines",
        ($"n_lines" - coalesce($"n_kept", lit(0L))).as("n_removed"),
        coalesce($"kept_hash", md5(lit(""))).as("text_hash"))
  }
}
