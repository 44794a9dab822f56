package graft.tool

import graft.schema.Span
import graft.text.{Json, Normalizer}
import graft.text.Json._

/** Frozen tool-output spec TOOL-1: role/tool-aware span extraction. The
  * dispatch-by-kind mirrors the reference's engine-aggregator dispatch
  * (vkit/engine/interface.py:188-227), made deterministic (tool name, not
  * weighted random).
  *
  * Formats (as produced by real agent harnesses and our synth generator):
  *  - bash:   lines; "$ cmd" prompt lines and "exit_code: N" / "[exit N]"
  *            frames are boilerplate; contiguous runs of remaining
  *            non-blank lines form blocks (one span per line).
  *  - python: ">>> " / "... " REPL prompt lines are boilerplate; the rest
  *            is content, grouped like bash.
  *  - search: JSON {"results":[{"title","url","snippet"}]}; title and
  *            snippet of each result are content (one block per result;
  *            url is boilerplate). Falls back to line rules on parse error.
  *  - other/unknown tool: every non-blank line is content.
  */
object ToolSpans {

  /** Returns (extractor kind, spans): kind is "tool_search" when the
    * search JSON parsed (render then uses JSON unescape + ' ' joiner),
    * else "tool" (identity decode, one line per block).
    */
  def extract(tool: String, text: String): (String, Vector[Span]) =
    tool match {
      case "search" =>
        try ("tool_search", searchSpans(text))
        catch { case _: Exception => ("tool", lineSpans(text, _ => true)) }
      case "bash" =>
        ("tool", lineSpans(text, l => !isBashBoiler(l)))
      case "python" =>
        ("tool", lineSpans(text, l => !isPyBoiler(l)))
      case _ =>
        ("tool", lineSpans(text, _ => true))
    }

  private def isBashBoiler(line: String): Boolean = {
    val t = line.trim
    t.startsWith("$ ") || t == "$" || t.startsWith("exit_code:") ||
      (t.startsWith("[exit ") && t.endsWith("]"))
  }

  private def isPyBoiler(line: String): Boolean = {
    val t = line.trim
    t.startsWith(">>>") || t.startsWith("... ")
  }

  /** One span per kept non-blank line; every kept line is its own block,
    * so extracted text preserves line structure ('\n'-joined by RENDER-1).
    */
  def lineSpans(text: String, keep: String => Boolean): Vector[Span] = {
    val out = Vector.newBuilder[Span]
    var i = 0
    val n = text.length
    while (i < n) {
      var j = text.indexOf('\n', i)
      if (j < 0) j = n
      val line = text.substring(i, j)
      if (!Normalizer.isBlank(line) && keep(line))
        out += Span(i, j, "block")
      i = j + 1
    }
    out.result()
  }

  /** Search results: per result one block of (title, snippet) spans. */
  private def searchSpans(text: String): Vector[Span] = {
    Json.parse(text) match {
      case JObj(fields) =>
        JObj(fields).get("results") match {
          case Some(JArr(items)) =>
            items.flatMap {
              case JObj(f) =>
                val o = JObj(f)
                val parts = Vector("title", "snippet").flatMap(k =>
                  o.get(k) match {
                    case Some(JStr(v, b, e)) if v.nonEmpty =>
                      Some(Span(b, e, "cont"))
                    case _ => None
                  })
                parts.zipWithIndex.map { case (s, i) =>
                  Span(s.begin, s.end, if (i == 0) "block" else "cont")
                }
              case _ => Vector.empty
            }
          case _ => Vector.empty
        }
      case _ => Vector.empty
    }
  }
}
