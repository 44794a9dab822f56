package graft.html

/** Streaming single-pass HTML tokenizer, HTML5-flavoured error recovery,
  * no regex, no backtracking beyond a bounded lookahead — the design the
  * reference uses for its streaming byte-scan corpus sampler
  * (vkit/engine/char_sampler/corpus.py:71-103): one forward cursor,
  * bounded local scans, never re-reads.
  *
  * Tokens carry RAW source offsets; text is decoded later (Render/ENT-1)
  * so spans always index the original payload.
  */
object HtmlTokenizer {

  sealed trait Token
  /** Raw text run [begin,end) in source (entities NOT decoded). */
  final case class TText(begin: Int, end: Int) extends Token
  final case class TStart(name: String, attrs: List[(String, String)],
      selfClosing: Boolean, begin: Int, end: Int) extends Token
  final case class TEnd(name: String, begin: Int, end: Int) extends Token
  /** Comment / doctype / bogus markup — skipped by the DOM builder. */
  final case class TSkip(begin: Int, end: Int) extends Token

  /** Elements whose content is raw text (no nested tags) per HTML5. */
  val rawTextTags: Set[String] =
    Set("script", "style", "textarea", "title", "xmp", "noscript")

  final class BoundsExceeded(what: String)
      extends Exception(s"tokenizer bound exceeded: $what")

  /** Tokenize `s`; at most `maxTokens` tokens (DOM-bomb guard — the
    * reference bounds every loop with retry caps, e.g.
    * vkit/pipeline/text_detection/page_cropping.py:266).
    */
  def tokenize(s: String, maxTokens: Int = 262144): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    scan(s, maxTokens)(out += _)
    out.result()
  }

  private val emptyAttrs: List[(String, String)] = Nil

  /** Streaming form: emit tokens to `sink` without materializing a
    * token vector (the DOM builder consumes this directly — one less
    * allocation pass per turn on the hot path).
    */
  def scan(s: String, maxTokens: Int = 262144,
      keepAttrs: Boolean = true)(sink: Token => Unit): Unit = {
    var count = 0
    def emit(t: Token): Unit = {
      count += 1
      if (count > maxTokens) throw new BoundsExceeded("maxTokens")
      sink(t)
    }
    val n = s.length
    var i = 0
    var rawEndTag: String = null // inside rawtext element, seeking </name

    while (i < n) {
      if (rawEndTag != null) {
        // RAWTEXT state: scan for case-insensitive "</name"
        val close = indexOfCloseTag(s, i, rawEndTag)
        val stop = if (close < 0) n else close
        if (stop > i) emit(TText(i, stop))
        if (close < 0) i = n
        else {
          // consume the end tag: "</name" then skip to '>'
          var j = close + 2 + rawEndTag.length
          while (j < n && s.charAt(j) != '>') j += 1
          val end = if (j < n) j + 1 else n
          emit(TEnd(rawEndTag, close, end))
          i = end
        }
        rawEndTag = null
      } else {
        val lt = s.indexOf('<', i)
        if (lt < 0) { if (n > i) emit(TText(i, n)); i = n }
        else {
          if (lt > i) emit(TText(i, lt))
          i = lt
          if (lt + 1 >= n) { emit(TText(lt, n)); i = n } // trailing '<'
          else {
            val c = s.charAt(lt + 1)
            if (c == '/') {
              // end tag
              val (name, end) = readEndTag(s, lt)
              if (name == null) { emit(TText(lt, lt + 1)); i = lt + 1 }
              else { emit(TEnd(name, lt, end)); i = end }
            } else if (c == '!') {
              if (s.startsWith("<!--", lt)) {
                val close = s.indexOf("-->", lt + 4)
                val end = if (close < 0) n else close + 3
                emit(TSkip(lt, end)); i = end
              } else {
                // doctype / CDATA-as-bogus: skip to '>'
                val gt = s.indexOf('>', lt + 2)
                val end = if (gt < 0) n else gt + 1
                emit(TSkip(lt, end)); i = end
              }
            } else if (c == '?') {
              val gt = s.indexOf('>', lt + 2)
              val end = if (gt < 0) n else gt + 1
              emit(TSkip(lt, end)); i = end
            } else if (isAsciiLetter(c)) {
              val tok = readStartTag(s, lt, keepAttrs)
              emit(tok)
              i = tok.end
              if (!tok.selfClosing && rawTextTags.contains(tok.name))
                rawEndTag = tok.name
            } else { // stray '<'
              emit(TText(lt, lt + 1)); i = lt + 1
            }
          }
        }
      }
    }
  }

  @inline private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  @inline private def isNameChar(c: Char): Boolean =
    isAsciiLetter(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' ||
      c == ':'

  @inline private def isHtmlWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Find "</tag" (ASCII case-insensitive) at or after `from`; -1 if
    * absent.
    */
  private def indexOfCloseTag(s: String, from: Int, tag: String): Int = {
    var i = from
    val n = s.length
    while (i >= 0) {
      i = s.indexOf('<', i)
      if (i < 0 || i + 1 + tag.length >= n + 1) return -1
      if (i + 1 < n && s.charAt(i + 1) == '/' &&
        s.regionMatches(true, i + 2, tag, 0, tag.length)) {
        val after = i + 2 + tag.length
        if (after >= n || s.charAt(after) == '>' || isHtmlWs(s.charAt(after)))
          return i
      }
      i += 1
    }
    -1
  }

  /** Parse "</name ... >" at `lt`; (null, _) if malformed. */
  private def readEndTag(s: String, lt: Int): (String, Int) = {
    val n = s.length
    var j = lt + 2
    val nameStart = j
    while (j < n && isNameChar(s.charAt(j))) j += 1
    if (j == nameStart) return (null, 0)
    val name = s.substring(nameStart, j).toLowerCase
    while (j < n && s.charAt(j) != '>') j += 1
    (name, if (j < n) j + 1 else n)
  }

  /** Parse a start tag at `lt` ('<' + letter guaranteed). `keepAttrs =
    * false` skips attribute materialization (segmentation never reads
    * them) while still honoring quoting for the tag-end scan.
    */
  private def readStartTag(s: String, lt: Int,
      keepAttrs: Boolean = true): TStart = {
    val n = s.length
    var j = lt + 1
    val nameStart = j
    while (j < n && isNameChar(s.charAt(j))) j += 1
    val name = s.substring(nameStart, j).toLowerCase
    val attrs = List.newBuilder[(String, String)]
    var selfClosing = false
    var done = false
    while (!done && j < n) {
      while (j < n && isHtmlWs(s.charAt(j))) j += 1
      if (j >= n) done = true
      else s.charAt(j) match {
        case '>' => j += 1; done = true
        case '/' =>
          if (j + 1 < n && s.charAt(j + 1) == '>') {
            selfClosing = true; j += 2; done = true
          } else j += 1
        case _ =>
          // attribute name
          val aStart = j
          while (j < n && !isHtmlWs(s.charAt(j)) && s.charAt(j) != '=' &&
            s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
          val aEnd = j
          while (j < n && isHtmlWs(s.charAt(j))) j += 1
          var vStart = -1
          var vEnd = -1
          if (j < n && s.charAt(j) == '=') {
            j += 1
            while (j < n && isHtmlWs(s.charAt(j))) j += 1
            if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
              val q = s.charAt(j)
              j += 1
              vStart = j
              while (j < n && s.charAt(j) != q) j += 1
              vEnd = j
              if (j < n) j += 1
            } else {
              vStart = j
              while (j < n && !isHtmlWs(s.charAt(j)) && s.charAt(j) != '>')
                j += 1
              vEnd = j
            }
          }
          if (keepAttrs && aEnd > aStart)
            attrs += ((s.substring(aStart, aEnd).toLowerCase,
              if (vStart < 0) "" else s.substring(vStart, vEnd)))
      }
    }
    TStart(name, attrs.result(), selfClosing, lt, j)
  }
}
