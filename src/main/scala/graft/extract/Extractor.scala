package graft.extract

import graft.html.{Boilerplate, Dom, HtmlTokenizer}
import graft.pdf.XyCut
import graft.schema.{Extraction, Span, Turn, Versions}
import graft.text.{Normalizer, Render}
import graft.tool.ToolSpans

/** The per-turn extractor router — deterministic payload dispatch
  * (role/tool/content sniffing), the reference's weighted engine-selector
  * (vkit/engine/interface.py:188-227) made deterministic. Pure function of
  * the row: safe under Spark task retries (the determinism contract the
  * reference gets from SeedSequence spawning, vkit/utility/pool.py:86-96).
  *
  * All failures (tokenizer bounds, malformed JSON) fall back to the plain
  * path with `error` set — the reference's fallback-to-NOP-on-invalid
  * pattern (vkit/element/polygon.py:569-577).
  */
object Extractor {

  /** Content sniffing: which extractor handles this turn? */
  def route(role: String, tool: String, text: String): String = {
    if (role == "tool" || (tool != null && tool.nonEmpty)) "tool"
    else if (looksHtml(text)) "html"
    else if (looksPdfRuns(text)) "pdf"
    else if (looksMd(text)) "md"
    else "plain"
  }

  /** Strict markdown sniff (MD-1): an ATX heading at the first non-ws
    * char AND at least one further structural marker. Deliberately
    * narrow so no payload the plain path previously owned can reroute
    * unless it is unmistakably markdown.
    */
  def looksMd(text: String): Boolean = {
    val t = firstNonWs(text)
    t >= 0 && text.startsWith("# ", t) &&
      (text.contains("\n- ") || text.contains("\n```"))
  }

  def looksHtml(text: String): Boolean = {
    val t = firstNonWs(text)
    if (t < 0 || text.charAt(t) != '<') return false
    val probe = text.substring(t, math.min(text.length, t + 512))
      .toLowerCase
    probe.startsWith("<!doctype") || probe.startsWith("<html") ||
      probe.contains("<div") || probe.contains("<p>") ||
      probe.contains("<p ") || probe.contains("<body") ||
      probe.contains("<span") || probe.contains("<table") ||
      probe.contains("<ul") || probe.contains("<h1") ||
      probe.contains("<article") || probe.contains("<section") ||
      probe.contains("<br")
  }

  def looksPdfRuns(text: String): Boolean = {
    val t = firstNonWs(text)
    t >= 0 && text.charAt(t) == '[' &&
      text.indexOf("\"x0\"") >= 0 && text.indexOf("\"text\"") >= 0
  }

  private def firstNonWs(s: String): Int = {
    var i = 0
    while (i < s.length) {
      if (!Normalizer.isWs(s.charAt(i))) return i
      i += 1
    }
    -1
  }

  /** Plain-text spec PLAIN-1: paragraphs split at blank lines; one span
    * per paragraph covering [first non-ws char, last non-ws char + 1).
    */
  def plainSpans(text: String): Vector[Span] = {
    val out = Vector.newBuilder[Span]
    var i = 0
    val n = text.length
    var parStart = -1 // first non-ws char of current paragraph
    var parEnd = -1 // one past last non-ws char
    var lineHasContent = false
    var lineStart = 0
    def flushPar(): Unit = {
      if (parStart >= 0) out += Span(parStart, parEnd, "block")
      parStart = -1; parEnd = -1
    }
    while (i <= n) {
      if (i == n || text.charAt(i) == '\n') {
        if (!lineHasContent) flushPar()
        lineHasContent = false
        lineStart = i + 1
      } else {
        val c = text.charAt(i)
        if (!Normalizer.isWs(c)) {
          lineHasContent = true
          if (parStart < 0) parStart = i
          parEnd = i + 1
        }
      }
      i += 1
    }
    flushPar()
    out.result()
  }

  private val domLimits = Dom.Limits()

  /** Extract one turn. NEVER throws: any failure (tokenizer bounds,
    * malformed JSON, or an unforeseen bug on a hostile payload) becomes
    * an error-flagged plain-text fallback — at 10^12 turns a
    * one-in-a-billion payload must not kill a task (the reference's
    * fallback-to-NOP pattern, vkit/element/polygon.py:569-577).
    */
  def extract(role: String, tool: String, text: String): Extraction = {
    val payload = if (text == null) "" else text
    extractKind(route(role, if (tool == null) "" else tool, payload),
      tool, payload)
  }

  /** Run one specific extractor kind ("tool" | "html" | "pdf" |
    * "plain") on the payload, with the same never-throws fallback.
    */
  def extractKind(kind: String, tool: String, text: String): Extraction = {
    val payload = if (text == null) "" else text
    try {
      kind match {
        case "tool" =>
          val (k, spans) = ToolSpans.extract(tool, payload)
          finish(k, payload, spans, "")
        case "html" =>
          val (extracted, spans) = Boilerplate.extract(payload, domLimits)
          // block texts are non-empty by construction, so this equals
          // finish(...) without the re-render
          Extraction("html", extracted, spans, "",
            Versions.ExtractorVersion)
        case "pdf" =>
          finish("pdf", payload, XyCut.extractSpans(payload), "")
        case "md" =>
          finish("md", payload, graft.md.Markdown.spans(payload), "")
        case _ =>
          finish("plain", payload, plainSpans(payload), "")
      }
    } catch {
      case e: StackOverflowError =>
        fallback(payload, new Exception("stack overflow"))
      case scala.util.control.NonFatal(e) => fallback(payload, e)
    }
  }

  def extract(t: Turn): Extraction = extract(t.role, t.tool, t.text)

  /** COLLATE-1 accept threshold: a primary extraction with fewer
    * whitespace tokens than this is degenerate.
    */
  val MinContentTokens = 5

  /** Collate with a second opinion — the reference's multi-engine
    * func_collate (vkit/engine/interface.py:230-270) as a deterministic
    * two-candidate rule (COLLATE-1, frozen; the x_collate oracle
    * mirrors it): run the sniffed extractor; if its extracted text has
    * < MinContentTokens whitespace tokens and the primary is not
    * already plain, fall back to plain extraction of the raw payload,
    * tagged extractor = "plain_fallback". Typical win: a page whose
    * content the boilerplate classifier drops entirely (short docs
    * framed in nav/footer chrome) still yields its raw text.
    */
  def extractCollated(role: String, tool: String,
      text: String): Extraction = {
    val primary = extract(role, tool, text)
    if (primary.extractor == "plain" ||
      wsTokenCount(primary.extracted_text) >= MinContentTokens) primary
    else {
      val payload = if (text == null) "" else text
      finish("plain", payload, plainSpans(payload), primary.error)
        .copy(extractor = "plain_fallback")
    }
  }

  /** Deterministic engine ensemble — the reference assembles engine
    * aggregators from a JSON [{type, weight, config}] list
    * (vkit/engine/interface.py:279-411) and samples by weight; here
    * candidates run in DESCENDING WEIGHT order (stable on ties) and the
    * first non-degenerate result (COLLATE-1 rule) wins; if every
    * candidate is degenerate, the last one tried is returned. Candidate
    * types: "sniffed" (role/content routing) or a forced kind.
    */
  def extractEnsemble(candidates: Seq[(String, Double)], role: String,
      tool: String, text: String): Extraction = {
    require(candidates.nonEmpty, "ensemble needs at least one candidate")
    val ordered = candidates.sortBy(-_._2)
    var last: Extraction = null
    for ((typ, _) <- ordered) {
      val ex =
        if (typ == "sniffed") extract(role, tool, text)
        else extractKind(typ, tool, text)
      if (wsTokenCount(ex.extracted_text) >= MinContentTokens) return ex
      last = ex
    }
    last
  }

  private def wsTokenCount(s: String): Int = {
    var n = 0
    var inTok = false
    var i = 0
    while (i < s.length) {
      val ws = Normalizer.isWs(s.charAt(i))
      if (!ws && !inTok) n += 1
      inTok = !ws
      i += 1
    }
    n
  }

  private def finish(kind: String, payload: String, spans: Seq[Span],
      error: String): Extraction = {
    // Render each block once; drop blocks that render empty so
    // extracted_text is always exactly render(payload, spans, kind)
    // with no empty blocks (render == '\n'-join of block texts).
    val rendered = Render.blocks(spans)
      .map(b => (b, Render.blockText(payload, b, kind)))
      .filter(_._2.nonEmpty)
    Extraction(kind, rendered.map(_._2).mkString("\n"),
      rendered.flatMap(_._1), error, Versions.ExtractorVersion)
  }

  private def fallback(payload: String, e: Throwable): Extraction = {
    val ex = finish("plain", payload, plainSpans(payload),
      s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
    ex
  }
}
