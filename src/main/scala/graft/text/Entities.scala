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
  * Hot-path design: name lookup is an open-addressing table probed with
  * (offset, length) region hashing — no substring, no tuple, no boxing
  * per '&' encountered (this path runs once per ampersand of every HTML
  * text node on every executor core).
  *
  * Reference precedent for a pinned char table:
  * vkit/utility/text/const/whitespace.py, const/delimiter.py.
  */
object Entities {

  /** Open-addressing (linear probe) map from entity name to decoded
    * string, supporting allocation-free region lookups.
    */
  private final class RegionMap(entries: Iterator[(String, String)],
      capacity: Int) {
    private val mask = capacity - 1
    private val keys = new Array[String](capacity)
    private val vals = new Array[String](capacity)
    var size = 0
    var maxKeyLen = 0
    entries.foreach { case (k, v) =>
      var idx = hashOf(k) & mask
      while (keys(idx) != null) idx = (idx + 1) & mask
      keys(idx) = k; vals(idx) = v
      size += 1
      if (k.length > maxKeyLen) maxKeyLen = k.length
    }

    private def hashOf(k: String): Int = {
      var h = 0
      var i = 0
      while (i < k.length) { h = h * 31 + k.charAt(i); i += 1 }
      h
    }

    /** Value for s[from, from+len), or null. Allocation-free. */
    def get(s: String, from: Int, len: Int): String = {
      var h = 0
      var i = from
      val until = from + len
      while (i < until) { h = h * 31 + s.charAt(i); i += 1 }
      var idx = h & mask
      var k = keys(idx)
      while (k != null) {
        if (k.length == len && s.regionMatches(from, k, 0, len))
          return vals(idx)
        idx = (idx + 1) & mask
        k = keys(idx)
      }
      null
    }
  }

  private def parsePacked(packed: String): Iterator[(String, String)] =
    packed.split('\n').iterator.map { line =>
      val sp = line.indexOf(' ')
      val name = line.substring(0, sp)
      val sb = new java.lang.StringBuilder(4)
      line.substring(sp + 1).split(',')
        .foreach(h => sb.appendCodePoint(Integer.parseInt(h, 16)))
      (name, sb.toString)
    }

  /** `&name;` entries, keyed without the ';'. */
  private val full =
    new RegionMap(parsePacked(EntityTable.fullPacked), 8192)

  /** Historical semicolon-less entries (spec still decodes in text). */
  private val legacy =
    new RegionMap(parsePacked(EntityTable.legacyPacked), 512)

  private val maxNameLen = full.maxKeyLen // 31
  private val maxLegacyLen = legacy.maxKeyLen // 6

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

  /** Decode the character reference at `s(i) == '&'` (scanning no
    * further than `until`), appending the decoded text to `sb`.
    * Returns the number of source chars consumed (incl. '&' and any
    * ';'), or 0 when this is not a decodable reference (caller emits
    * '&' verbatim and advances by 1). Allocation-free.
    */
  def refAppend(sb: java.lang.StringBuilder, s: String, i: Int,
      until: Int): Int = {
    if (i + 1 >= until) return 0
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
      if (!any) return 0
      val end = if (j < until && s.charAt(j) == ';') j + 1 else j
      var code = cp.toInt
      if (code >= 0x80 && code <= 0x9F) code = win1252(code - 0x80)
      if (code <= 0 || code >= 0x110000 ||
        (code >= 0xD800 && code <= 0xDFFF)) 0
      else { sb.appendCodePoint(code); end - i }
    } else {
      var j = i + 1
      val lim = math.min(until, i + 1 + maxNameLen)
      while (j < lim && isAlnum(s.charAt(j))) j += 1
      val runLen = j - (i + 1)
      if (runLen == 0) return 0
      if (j < until && s.charAt(j) == ';') {
        val v = full.get(s, i + 1, runLen)
        if (v != null) { sb.append(v); return runLen + 2 }
      }
      // spec text-context fallback: longest legacy (semicolon-less)
      // table entry that prefixes the alphanumeric run
      var len = math.min(runLen, maxLegacyLen)
      while (len >= 2) {
        val v = legacy.get(s, i + 1, len)
        if (v != null) { sb.append(v); return len + 1 }
        len -= 1
      }
      0
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
      // bulk-copy the amp-free run (String.getChars memcopy beats
      // per-char append ~3x on this path)
      var amp = s.indexOf('&', i)
      if (amp < 0 || amp > until) amp = until
      if (amp > i) {
        sb.append(s, i, amp)
        if (!nonBlank) {
          var k = i
          while (k < amp && !nonBlank) {
            if (!Normalizer.isWs(s.charAt(k))) nonBlank = true
            k += 1
          }
        }
        i = amp
      }
      if (i < until) { // s(i) == '&'
        val before = sb.length
        val consumed = refAppend(sb, s, i, until)
        if (consumed == 0) { sb.append('&'); nonBlank = true; i += 1 }
        else {
          if (!nonBlank) {
            var k = before
            while (k < sb.length && !nonBlank) {
              if (!Normalizer.isWs(sb.charAt(k))) nonBlank = true
              k += 1
            }
          }
          i += consumed
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
        val consumed = refAppend(sb, s, i, n)
        if (consumed == 0) { sb.append('&'); i += 1 }
        else i += consumed
      }
    }
    sb.toString
  }
}
