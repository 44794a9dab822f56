package graft.md

import graft.schema.Span

/** MD-1: markdown extraction, frozen. Line-oriented (every visible
  * line is one render block; RENDER-1 then joins blocks with '\n' and
  * ws-collapses each), with the reference's structure-markup-vs-content
  * split re-expressed for markdown instead of HTML tags
  * (vkit inverse analogue: the html tokenizer/DOM pipeline —
  * html/HtmlTokenizer.scala — for a lighter markup family).
  *
  * Rules (all offsets index the raw payload; spans never cover markup):
  *  1. A line starting with ``` at column 0 toggles code mode and is
  *     dropped. An unterminated fence runs to end of payload.
  *  2. In code mode every line with a non-whitespace char is ONE block
  *     span covering the whole line — content verbatim (asterisks and
  *     marker chars included; RENDER-1's wsCollapse still applies).
  *  3. Outside code: blank lines are dropped. A leading #{1,6} + space
  *     (at the line's first non-ws char) is an ATX heading marker and
  *     is stripped; else a leading "- " is a list-item marker and is
  *     stripped.
  *  4. The remaining line content splits at '*' characters: asterisks
  *     are ALWAYS markup outside code (MD-1 simplification — no
  *     pairing analysis) and are excluded from spans; the non-empty
  *     fragments become one block ("block" + "cont" spans, ""-joined
  *     by RENDER-1). A line whose fragments are all whitespace emits
  *     nothing.
  *  5. '#' not followed by a space, or '-' not followed by a space, is
  *     content, not a marker.
  */
object Markdown {

  def spans(text: String): Vector[Span] = {
    val out = Vector.newBuilder[Span]
    val n = text.length
    var ls = 0
    var inCode = false
    while (ls <= n) {
      var le = text.indexOf('\n', ls)
      if (le < 0) le = n
      if (startsWithFence(text, ls, le)) {
        inCode = !inCode
      } else if (inCode) {
        if (hasNonWs(text, ls, le)) out += Span(ls, le, "block")
      } else {
        val fs = firstNonWs(text, ls, le)
        if (fs >= 0) {
          var cs = fs
          if (text.charAt(fs) == '#') {
            var h = fs
            while (h < le && text.charAt(h) == '#') h += 1
            if (h - fs <= 6 && h < le && text.charAt(h) == ' ') cs = h + 1
          } else if (text.charAt(fs) == '-' && fs + 1 < le &&
            text.charAt(fs + 1) == ' ') {
            cs = fs + 2
          }
          emitFragments(text, cs, le, out)
        }
      }
      ls = le + 1
    }
    out.result()
  }

  /** Non-empty runs between '*' chars; emitted only when at least one
    * run has visible content (so no block renders empty).
    */
  private def emitFragments(text: String, cs: Int, le: Int,
      out: scala.collection.mutable.Builder[Span, Vector[Span]]): Unit = {
    var any = false
    var i = cs
    while (!any && i < le) {
      val c = text.charAt(i)
      if (c != '*' && !graft.text.Normalizer.isWs(c)) any = true
      i += 1
    }
    if (!any) return
    var first = true
    var a = cs
    while (a < le) {
      if (text.charAt(a) == '*') a += 1
      else {
        var b = a
        while (b < le && text.charAt(b) != '*') b += 1
        out += Span(a, b, if (first) "block" else "cont")
        first = false
        a = b
      }
    }
  }

  private def startsWithFence(text: String, ls: Int, le: Int): Boolean =
    le - ls >= 3 && text.charAt(ls) == '`' && text.charAt(ls + 1) == '`' &&
      text.charAt(ls + 2) == '`'

  private def firstNonWs(text: String, from: Int, to: Int): Int = {
    var i = from
    while (i < to) {
      if (!graft.text.Normalizer.isWs(text.charAt(i))) return i
      i += 1
    }
    -1
  }

  private def hasNonWs(text: String, from: Int, to: Int): Boolean =
    firstNonWs(text, from, to) >= 0
}
