package graft.text

/** Frozen HTML entity table ENT-1. Named subset (the common entities our
  * payloads can contain) plus full numeric dec/hex references. Unknown or
  * malformed references pass through verbatim (HTML5 error-recovery
  * behavior). Single pass, no regex.
  *
  * Reference precedent for a pinned char table:
  * vkit/utility/text/const/whitespace.py, const/delimiter.py.
  */
object Entities {

  val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "laquo" -> "«",
    "raquo" -> "»", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "bull" -> "•",
    "middot" -> "·", "times" -> "×", "divide" -> "÷",
    "deg" -> "°", "plusmn" -> "±", "frac12" -> "½",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "ccedil" -> "ç", "uuml" -> "ü", "ouml" -> "ö",
    "auml" -> "ä", "szlig" -> "ß", "ntilde" -> "ñ")

  private val maxNameLen = named.keys.map(_.length).max

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
        val semi = s.indexOf(';', i + 1)
        val limit = i + 2 + math.max(maxNameLen, 8)
        val decoded =
          if (semi < 0 || semi >= until || semi > limit) null
          else decodeBody(s.substring(i + 1, semi))
        if (decoded == null) { sb.append('&'); nonBlank = true; i += 1 }
        else {
          sb.append(decoded)
          if (!Normalizer.isBlank(decoded)) nonBlank = true
          i = semi + 1
        }
      }
    }
    nonBlank
  }

  /** Decode entity references in `s`. Handles `&name;`, `&#123;`,
    * `&#x1F;`/`&#X1F;`. A reference missing its terminating ';' or naming
    * an unknown entity is emitted verbatim.
    */
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
        val semi = s.indexOf(';', i + 1)
        val limit = i + 2 + math.max(maxNameLen, 8)
        if (semi < 0 || semi > limit) { sb.append('&'); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val decoded = decodeBody(body)
          if (decoded == null) { sb.append('&'); i += 1 }
          else { sb.append(decoded); i = semi + 1 }
        }
      }
    }
    sb.toString
  }

  /** Decode the text between '&' and ';'; null if not a valid reference. */
  private def decodeBody(body: String): String = {
    if (body.isEmpty) null
    else if (body.charAt(0) == '#') {
      val num = body.substring(1)
      try {
        val cp =
          if (num.nonEmpty && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
            Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num, 10)
        if (cp <= 0 || cp > 0x10FFFF ||
          (cp >= 0xD800 && cp <= 0xDFFF)) null
        else new String(Character.toChars(cp))
      } catch { case _: NumberFormatException => null }
    } else named.getOrElse(body, null)
  }
}
