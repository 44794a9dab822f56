package graft.text

/** Frozen HTML entity table ENT-2: the full WHATWG named character
  * reference list (2,125 `&name;` entries incl. multi-codepoint ones,
  * packed in EntityTable) plus the 106 semicolon-less legacy forms with
  * spec-faithful longest-prefix matching in text, plus numeric dec/hex
  * references with optional ';' and the spec's windows-1252 override
  * for the C1 range. Unknown or malformed references pass through
  * verbatim (extraction-fidelity deviation from the spec's U+FFFD
  * replacement for out-of-range code points). Single pass, no regex.
  *
  * Reference precedent for a pinned char table:
  * vkit/utility/text/const/whitespace.py, const/delimiter.py.
  */
object Entities {

  private def parse(packed: String): java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](4096)
    packed.split('\n').foreach { line =>
      val sp = line.indexOf(' ')
      val name = line.substring(0, sp)
      val cps = line.substring(sp + 1).split(',')
        .map(Integer.parseInt(_, 16))
      val sb = new java.lang.StringBuilder(4)
      cps.foreach(sb.appendCodePoint)
      m.put(name, sb.toString)
    }
    m
  }

  /** `&name;` entries, keyed without the ';'. */
  private val full = parse(EntityTable.fullPacked)

  /** Historical semicolon-less entries (spec still decodes in text). */
  private val legacy = parse(EntityTable.legacyPacked)

  private val maxNameLen =
    EntityTable.fullPacked.split('\n').iterator
      .map(l => l.indexOf(' ')).max // 31
  private val maxLegacyLen =
    EntityTable.legacyPacked.split('\n').iterator
      .map(l => l.indexOf(' ')).max // 6

  def namedCount: Int = full.size
  def legacyCount: Int = legacy.size

  /** Spec's numeric-reference override: C1 code points decode via the
    * windows-1252 table (https://html.spec.whatwg.org/ "Numeric
    * character reference end state").
    */
  private val win1252: Array[Int] = {
    val a = Array.tabulate(32)(i => 0x80 + i)
    val m = Map(0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192,
      0x84 -> 0x201E, 0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021,
      0x88 -> 0x02C6, 0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039,
      0x8C -> 0x0152, 0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019,
      0x93 -> 0x201C, 0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013,
      0x97 -> 0x2014, 0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161,
      0x9B -> 0x203A, 0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    m.foreach { case (k, v) => a(k - 0x80) = v }
    a
  }

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9')

  @inline private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Longest-match character reference at `s(i) == '&'` scanning no
    * further than `until`. Returns (decoded, charsConsumed incl. '&'
    * and any ';'), or null when this is not a decodable reference
    * (caller emits '&' verbatim and advances by 1).
    */
  def matchRef(s: String, i: Int, until: Int): (String, Int) = {
    if (i + 1 >= until) return null
    if (s.charAt(i + 1) == '#') {
      var j = i + 2
      var cp = 0L
      var any = false
      if (j < until && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
        j += 1
        var h = if (j < until) hexVal(s.charAt(j)) else -1
        while (h >= 0) {
          cp = math.min(cp * 16 + h, 0x110000L); any = true; j += 1
          h = if (j < until) hexVal(s.charAt(j)) else -1
        }
      } else {
        while (j < until && s.charAt(j) >= '0' && s.charAt(j) <= '9') {
          cp = math.min(cp * 10 + (s.charAt(j) - '0'), 0x110000L)
          any = true; j += 1
        }
      }
      if (!any) return null
      val end = if (j < until && s.charAt(j) == ';') j + 1 else j
      var code = cp.toInt
      if (code >= 0x80 && code <= 0x9F) code = win1252(code - 0x80)
      if (code <= 0 || code >= 0x110000 ||
        (code >= 0xD800 && code <= 0xDFFF)) null
      else (new String(Character.toChars(code)), end - i)
    } else {
      var j = i + 1
      val lim = math.min(until, i + 1 + maxNameLen)
      while (j < lim && isAlnum(s.charAt(j))) j += 1
      if (j == i + 1) return null
      val run = s.substring(i + 1, j)
      if (j < until && s.charAt(j) == ';') {
        val v = full.get(run)
        if (v != null) return (v, run.length + 2)
      }
      // spec text-context fallback: longest legacy (semicolon-less)
      // table entry that prefixes the alphanumeric run
      var len = math.min(run.length, maxLegacyLen)
      while (len >= 2) {
        val v = legacy.get(run.substring(0, len))
        if (v != null) return (v, len + 1)
        len -= 1
      }
      null
    }
  }

  /** Append the decoded form of `s[from, until)` to `sb` without
    * allocating an intermediate substring (hot path: one call per HTML
    * text node). Returns true iff any character was non-whitespace
    * (fused blank check — saves a second scan).
    */
  def decodeAppend(sb: java.lang.StringBuilder, s: String, from: Int,
      until: Int): Boolean = {
    var nonBlank = false
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (c != '&') {
        sb.append(c)
        if (!Normalizer.isWs(c)) nonBlank = true
        i += 1
      } else {
        val m = matchRef(s, i, until)
        if (m == null) { sb.append('&'); nonBlank = true; i += 1 }
        else {
          sb.append(m._1)
          if (!Normalizer.isBlank(m._1)) nonBlank = true
          i += m._2
        }
      }
    }
    nonBlank
  }

  /** Decode entity references in `s` (ENT-2 rules). */
  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val m = matchRef(s, i, n)
        if (m == null) { sb.append('&'); i += 1 }
        else { sb.append(m._1); i += m._2 }
      }
    }
    sb.toString
  }
}
