package graft.text

/** Minimal recursive-descent JSON parser that records SOURCE OFFSETS for
  * every string value — so spans can point at the raw payload (the
  * provenance requirement; cf. the reference's exact-position bookkeeping,
  * vkit/element/point.py:37-47 smooth/int dual positions).
  *
  * `JStr.begin/end` delimit the string CONTENT (between the quotes,
  * escapes included) in the source. No dependencies, single pass,
  * bounded recursion (maxDepth).
  */
object Json {

  sealed trait JValue
  final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
    def get(k: String): Option[JValue] = fields.find(_._1 == k).map(_._2)
  }
  final case class JArr(items: Vector[JValue]) extends JValue
  final case class JStr(value: String, begin: Int, end: Int) extends JValue
  final case class JNum(value: Double) extends JValue
  final case class JBool(value: Boolean) extends JValue
  case object JNull extends JValue

  final class ParseError(msg: String, val pos: Int)
      extends Exception(s"$msg at $pos")

  private val MaxDepth = 64

  def parse(s: String): JValue = {
    val p = new Parser(s)
    val v = p.value(0)
    p.skipWs()
    if (!p.eof) throw new ParseError("trailing content", p.pos)
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def peek: Char = s.charAt(pos)

    def skipWs(): Unit =
      while (!eof && (peek == ' ' || peek == '\t' || peek == '\n' ||
        peek == '\r')) pos += 1

    def value(depth: Int): JValue = {
      if (depth > MaxDepth) throw new ParseError("too deep", pos)
      skipWs()
      if (eof) throw new ParseError("eof", pos)
      peek match {
        case '{' => obj(depth)
        case '[' => arr(depth)
        case '"' => str()
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case _   => num()
      }
    }

    private def lit(word: String, v: JValue): JValue = {
      if (!s.startsWith(word, pos)) throw new ParseError("bad literal", pos)
      pos += word.length; v
    }

    private def obj(depth: Int): JObj = {
      pos += 1 // '{'
      val fields = Vector.newBuilder[(String, JValue)]
      skipWs()
      if (!eof && peek == '}') { pos += 1; return JObj(fields.result()) }
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        skipWs()
        if (eof || peek != ':') throw new ParseError("expected :", pos)
        pos += 1
        fields += ((k.value, value(depth + 1)))
        skipWs()
        if (eof) throw new ParseError("eof in object", pos)
        else if (peek == ',') pos += 1
        else if (peek == '}') { pos += 1; done = true }
        else throw new ParseError("expected , or }", pos)
      }
      JObj(fields.result())
    }

    private def arr(depth: Int): JArr = {
      pos += 1 // '['
      val items = Vector.newBuilder[JValue]
      skipWs()
      if (!eof && peek == ']') { pos += 1; return JArr(items.result()) }
      var done = false
      while (!done) {
        items += value(depth + 1)
        skipWs()
        if (eof) throw new ParseError("eof in array", pos)
        else if (peek == ',') pos += 1
        else if (peek == ']') { pos += 1; done = true }
        else throw new ParseError("expected , or ]", pos)
      }
      JArr(items.result())
    }

    private def str(): JStr = {
      if (eof || peek != '"') throw new ParseError("expected string", pos)
      pos += 1
      val begin = pos
      val sb = new java.lang.StringBuilder
      while (true) {
        if (eof) throw new ParseError("eof in string", pos)
        val c = peek
        if (c == '"') {
          val end = pos; pos += 1
          return JStr(sb.toString, begin, end)
        } else if (c == '\\') {
          pos += 1
          if (eof) throw new ParseError("eof in escape", pos)
          sb.append(unescapeOne(s, pos) match {
            case (str2, adv) => { pos += adv; str2 }
          })
        } else { sb.append(c); pos += 1 }
      }
      throw new ParseError("unreachable", pos)
    }

    private def num(): JNum = {
      val start = pos
      if (!eof && (peek == '-' || peek == '+')) pos += 1
      while (!eof && (peek.isDigit || peek == '.' || peek == 'e' ||
        peek == 'E' || peek == '-' || peek == '+')) pos += 1
      if (pos == start) throw new ParseError("bad number", pos)
      try JNum(java.lang.Double.parseDouble(s.substring(start, pos)))
      catch {
        case _: NumberFormatException =>
          throw new ParseError("bad number", start)
      }
    }
  }

  /** Decode one escape whose backslash has been consumed; s(at) is the
    * escape char. Returns (decoded, chars consumed).
    */
  private def unescapeOne(s: String, at: Int): (String, Int) =
    s.charAt(at) match {
      case '"'  => ("\"", 1)
      case '\\' => ("\\", 1)
      case '/'  => ("/", 1)
      case 'b'  => ("\b", 1)
      case 'f'  => ("\f", 1)
      case 'n'  => ("\n", 1)
      case 'r'  => ("\r", 1)
      case 't'  => ("\t", 1)
      case 'u' =>
        if (at + 5 > s.length) throw new ParseError("bad \\u", at)
        val cp = Integer.parseInt(s.substring(at + 1, at + 5), 16)
        (cp.toChar.toString, 5)
      case c => (c.toString, 1) // lenient
    }

  /** Decode JSON string escapes in a raw source slice (content between
    * quotes). Used by Render for pdf spans.
    */
  def unescape(raw: String): String = {
    var i = raw.indexOf('\\')
    if (i < 0) return raw
    val sb = new java.lang.StringBuilder(raw.length)
    sb.append(raw, 0, i)
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        val (dec, adv) = unescapeOne(raw, i + 1)
        sb.append(dec)
        i += 1 + adv
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
