package graft.schema

import java.sql.Timestamp

/** Input row shape, per BASELINE.json:input_hint — one row per transcript
  * turn. Mirrors the reference's per-record pipeline input (a page spec);
  * see /root/reference vkit/pipeline/interface.py:47-61 (PipelineState).
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** A half-open char interval [begin, end) into the ORIGINAL `text` payload.
  *
  * 1D analogue of the reference's `Box` (inclusive 2D interval product,
  * vkit/element/box.py:32-39). `kind` is "block" for a span that starts a
  * new output block and "cont" for a span continuing the current block —
  * the grouping that lets `Render` recompute `extracted_text` from spans
  * alone (the char<->box alignment invariant of
  * vkit/engine/font/freetype.py:934-940, restated in 1D).
  */
case class Span(begin: Int, end: Int, kind: String) {
  def len: Int = end - begin
  def shift(k: Int): Span = Span(begin + k, end + k, kind)
  def clip(lo: Int, hi: Int): Span =
    Span(math.max(begin, lo), math.min(end, hi), kind)
  def valid: Boolean = begin >= 0 && begin <= end
}

/** Per-turn extractor output. `spans` are sorted, pairwise disjoint,
  * in-bounds char offsets into the original payload; `extracted_text` MUST
  * equal `Render.render(text, spans, extractor)` (consistency-by-
  * construction, cf. the reference's distortion applying one transform to
  * every element view, vkit/mechanism/distortion/interface.py:823-912).
  */
case class Extraction(
    extractor: String, // plain | html | pdf | md | tool
    extracted_text: String,
    spans: Seq[Span],
    error: String, // "" when clean; non-empty => raw-text fallback used
    extractor_version: String)

/** Joined output row written by the pipeline. */
case class ExtractedTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    extractor: String,
    extracted_text: String,
    spans: Seq[Span],
    n_spans: Int,
    error: String,
    extractor_version: String)

/** Per-partition lineage row (reference analogue: the rng-state record
  * stored for replay, vkit/pipeline/interface.py:227-231, plus the pool's
  * per-worker bookkeeping, vkit/utility/pool.py:86-96).
  */
case class LineageRow(
    run_id: String,
    stage_id: Int,
    partition_id: Int,
    attempt: Int,
    rows_in: Long,
    rows_out: Long,
    errors: Long,
    wall_ms: Long,
    extractor_version: String)

object Versions {
  /** Frozen EXTRACTION spec version (stamped into every lineage row);
    * bump when NORM/ENT/BOIL/XYCUT/TOOL/RENDER/COLLATE/MD rules change.
    * v2: ENT-1 (34 names, ';' required) -> ENT-2 (full WHATWG table,
    * legacy semicolon-less forms, numeric refs with optional ';' and
    * the windows-1252 C1 override).
    * v3: MD-1 markdown engine added (ATX-heading-sniffed payloads that
    * previously fell to the plain path now extract structurally:
    * heading/item markers stripped, fences dropped with code verbatim,
    * asterisks excluded outside code).
    */
  val ExtractorVersion = "v3"

  /** Frozen language-ID spec version. The exact dictionary contents are
    * additionally pinned by `Lexicon.collection.contentHash` (sha256),
    * which t_lang_id emits as a column and the oracle hardcodes — a
    * stopword edit without a re-pin breaks the gate even if this string
    * is forgotten. v3: 4 -> 7 stopword languages at 50 words each;
    * script regexes derived from the charRanges interval table.
    * v4: script-presence breadth — ar/he/el/hi/th branches (thai added
    * to the interval table).
    */
  val LangIdVersion = "v4"

  /** Frozen multimodal decode spec version. v1: real PNG/GIF/BMP/JPEG/
    * WAV container-header parsing (incl. animated-GIF frame walk) with
    * deterministic stub fallback for unknown magic. v2 (MEDIA-2): real
    * CONTENT decode for uncompressed 24-bit BMP pixels and 16-bit PCM
    * WAV samples — integer luma/abs-sample 8-band embeddings + FNV-1a
    * content hashes; compressed formats keep the labeled codec stub.
    * v3: decode rules unchanged from v2, but the MEDIA-2 fixture
    * SYNTHESIS formulas gained a nonlinear cross term (see
    * Multimodal.synthContentPixel) so band-mean embeddings are
    * id-discriminative — content hashes/embeddings over the synth
    * corpora differ from v2's.
    * v4 (MEDIA-4): real COMPRESSED-format decode added for PNG
    * (8-bit truecolor, non-interlaced): chunk walk with CRC32
    * verification, concatenated-IDAT inflate via the JDK
    * java.util.zip.Inflater, all five scanline filters; same content
    * contract as BMP (luma FNV-1a + 8 row-band floor means). v2/v3
    * decode rules for BMP/WAV are unchanged.
    * v5 (MEDIA-5): real GIF content decode (spec LZW with growing
    * code widths, CLEAR/EOI/KwKwK, 4-pass interlace row de-ordering,
    * local-over-global palette); same luma content contract, so GIF
    * joins the BMP/PNG cross-format identity.
    * v6 (MEDIA-6): real baseline JPEG content decode (ops.Jpeg —
    * T.81 marker walk, canonical Huffman, byte-unstuffed bit reader,
    * RSTn, dequant + frozen IDCT: exact integer shortcut for DC-only
    * blocks, StrictMath-kernel double path otherwise; 1- or
    * 3-component with full-res component 0, single interleaved scan;
    * content = the LUMA plane under the shared hash/band contract).
    * v7 (MEDIA-7): progressive JPEG (SOF2, T.81 Annex G) — per-block
    * luma coefficient store across scans, DC/AC first + refinement
    * with EOB-run semantics, chroma-only scans skipped wholesale,
    * dequant + IDCT at EOI; same luma contract and the same flat-tile
    * lossless-fixture argument (identical coefficients, different
    * scan script). Arithmetic/lossless/12-bit/hierarchical JPEG
    * stub-fallback; prior formats unchanged.
    */
  val MediaVersion = "v7"
}
