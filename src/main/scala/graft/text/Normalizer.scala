package graft.text

/** Frozen normalization spec NORM-1 (FIXTURES.md section 2).
  *
  * The reference pins an explicit whitespace table
  * (vkit/utility/text/const/whitespace.py:1-96) and normalizes CJK
  * fullwidth forms (vkit/utility/text/opt.py:31-49); we do the same with a
  * frozen, versioned char policy so extracted text is byte-reproducible.
  *
  * Rules:
  *  - WS char class: Java `Character.isWhitespace` plus the NBSP family
  *    (U+00A0, U+2007, U+202F) and BOM/ZWNBSP (U+FEFF).
  *  - Fullwidth ASCII variants U+FF01..U+FF5E map to ASCII (cp - 0xFEE0);
  *    ideographic space U+3000 is whitespace (already via isWhitespace).
  *  - A run of WS collapses to a single ' '; leading/trailing WS trimmed.
  */
object Normalizer {

  @inline def isWs(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u00A0' || c == '\u2007' ||
      c == '\u202F' || c == '\uFEFF'

  @inline def normChar(c: Char): Char =
    if (c >= 0xFF01 && c <= 0xFF5E) (c - 0xFEE0).toChar else c

  /** Collapse whitespace runs to single spaces and trim; map fullwidth
    * ASCII to halfwidth. Single pass, no regex (hot path).
    */
  def wsCollapse(s: String): String = {
    val n = s.length
    // fast path: detect the (very common) already-collapsed shape —
    // single ' ' separators, no leading/trailing ws, no fullwidth —
    // and return the input with zero copies; on deviation fall into
    // the state machine with the clean prefix bulk-appended
    var dirty = -1
    var prevWs = true // leading ws is a deviation
    var f = 0
    while (f < n && dirty < 0) {
      val c = s.charAt(f)
      if (c == ' ') { if (prevWs) dirty = f else prevWs = true }
      else if (isWs(c) || (c >= 0xFF01 && c <= 0xFF5E)) dirty = f
      else prevWs = false
      f += 1
    }
    if (dirty < 0) {
      if (!prevWs || n == 0) return s
      return s.substring(0, n - 1) // single trailing ' '
    }
    val cut = // keep the prefix free of a trailing space
      if (dirty > 0 && s.charAt(dirty - 1) == ' ') dirty - 1 else dirty
    val sb = new java.lang.StringBuilder(n)
    sb.append(s, 0, cut)
    var i = cut
    var pendingSpace = false
    var started = cut > 0
    while (i < n) {
      if (isWs(s.charAt(i))) { if (started) pendingSpace = true; i += 1 }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        // bulk-append the run of plain (non-ws, non-fullwidth) chars
        var j = i
        var c = s.charAt(j)
        while (!isWs(c) && c < 0xFF01) {
          j += 1
          if (j < n) c = s.charAt(j)
          else c = ' ' // terminates the loop (isWs)
        }
        if (j > i) { sb.append(s, i, j); i = j }
        // single fullwidth (or other normalized) char, if any
        if (i < n && !isWs(s.charAt(i))) {
          sb.append(normChar(s.charAt(i)))
          i += 1
        }
        started = true
      }
    }
    sb.toString
  }

  /** True iff the string contains no non-whitespace char. */
  def isBlank(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (!isWs(s.charAt(i))) return false; i += 1 }
    true
  }
}
