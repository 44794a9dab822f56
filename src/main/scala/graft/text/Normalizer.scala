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
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(normChar(c))
        started = true
      }
      i += 1
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
