package graft.text

import graft.schema.Span

/** Frozen rendering rule RENDER-1: `extracted_text` is a pure function of
  * (raw payload, spans, extractor kind). This makes text/span drift
  * impossible by construction — the 1D analogue of the reference applying
  * ONE parameterized transform consistently to image+mask+points+polygons
  * (vkit/mechanism/distortion/interface.py:823-912).
  *
  * blocks   := group spans: a "block" span starts a block, "cont" continues
  * blockTxt := wsCollapse( concat_joiner( decode(raw[s.begin, s.end)) ) )
  * text     := non-empty blockTxts joined by '\n'
  *
  * decode and joiner are per-extractor:
  *   plain/tool: identity decode, "" joiner
  *   html:       HTML entity decode (Entities.decode), "" joiner
  *               (inline tags contribute nothing, faithful to HTML)
  *   pdf:        JSON string-escape decode (Json.unescape), " " joiner
  *               (runs on a line are separate words)
  */
object Render {

  def decode(extractor: String, s: String): String = extractor match {
    case "html"              => Entities.decode(s)
    case "pdf" | "tool_search" => Json.unescape(s)
    case _                   => s
  }

  def joiner(extractor: String): String = extractor match {
    case "pdf" | "tool_search" => " "
    case _                     => ""
  }

  /** Group spans into blocks by their kind markers. */
  def blocks(spans: Seq[Span]): Seq[Seq[Span]] = {
    val out = scala.collection.mutable.ArrayBuffer[Seq[Span]]()
    var cur = scala.collection.mutable.ArrayBuffer[Span]()
    for (s <- spans) {
      if (s.kind == "block" && cur.nonEmpty) { out += cur.toSeq; cur.clear() }
      cur += s
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  def blockText(raw: String, block: Seq[Span], extractor: String): String = {
    val j = joiner(extractor)
    val sb = new java.lang.StringBuilder
    var first = true
    for (s <- block) {
      if (!first) sb.append(j)
      sb.append(decode(extractor, raw.substring(s.begin, s.end)))
      first = false
    }
    Normalizer.wsCollapse(sb.toString)
  }

  /** The full rule. Extractors must emit spans such that no block renders
    * empty; `render` drops empty blocks anyway so goldens and engine can
    * never disagree on them.
    */
  def render(raw: String, spans: Seq[Span], extractor: String): String =
    blocks(spans).map(blockText(raw, _, extractor)).filter(_.nonEmpty)
      .mkString("\n")
}
