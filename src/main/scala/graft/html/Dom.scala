package graft.html

import HtmlTokenizer._

/** Lightweight immutable DOM built from the token stream with HTML5-style
  * error recovery (auto-close, orphan end tags ignored). Node/depth
  * bounded — overflow raises BoundsExceeded and the router falls back to
  * raw text (the reference's fallback-to-NOP-on-invalid pattern,
  * vkit/element/polygon.py:569-577).
  */
object Dom {

  sealed trait Node
  final case class Element(tag: String, attrs: List[(String, String)],
      children: Vector[Node]) extends Node
  /** Raw text range in the source payload. */
  final case class Text(begin: Int, end: Int) extends Node

  /** HTML void elements — never pushed on the open stack. */
  val voidTags: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  /** Simplified implied-end-tag table: seeing key start-tag closes any of
    * the value tags currently on top of the stack.
    */
  val autoClose: Map[String, Set[String]] = Map(
    "p" -> Set("p"),
    "li" -> Set("li"),
    "dt" -> Set("dt", "dd"),
    "dd" -> Set("dt", "dd"),
    "tr" -> Set("tr", "td", "th"),
    "td" -> Set("td", "th"),
    "th" -> Set("td", "th"),
    "option" -> Set("option"),
    "div" -> Set("p"),
    "ul" -> Set("p"),
    "ol" -> Set("p"),
    "table" -> Set("p"),
    "h1" -> Set("p"), "h2" -> Set("p"), "h3" -> Set("p"),
    "h4" -> Set("p"), "h5" -> Set("p"), "h6" -> Set("p"),
    "blockquote" -> Set("p"),
    "pre" -> Set("p"),
    "section" -> Set("p"), "article" -> Set("p"))

  final case class Limits(maxNodes: Int = 131072, maxDepth: Int = 256)

  /** One open element being built. */
  private final class Open(val tag: String,
      val attrs: List[(String, String)]) {
    val children = Vector.newBuilder[Node]
  }

  /** Incremental DOM builder: feed tokens, then `finish()`. */
  final class Builder(limits: Limits) extends (Token => Unit) {
    private var nodes = 0
    private val stack = new scala.collection.mutable.ArrayBuffer[Open]
    stack += new Open("#root", Nil)

    private def countNode(): Unit = {
      nodes += 1
      if (nodes > limits.maxNodes)
        throw new BoundsExceeded("maxNodes")
    }

    private def closeTop(): Unit = {
      val top = stack.remove(stack.length - 1)
      stack.last.children += Element(top.tag, top.attrs,
        top.children.result())
    }

    def apply(tok: Token): Unit = tok match {
      case TText(b, e) =>
        countNode()
        stack.last.children += Text(b, e)
      case TSkip(_, _) => ()
      case TStart(name, attrs, selfClosing, _, _) =>
        countNode()
        autoClose.get(name).foreach { closes =>
          while (stack.length > 1 && closes.contains(stack.last.tag))
            closeTop()
        }
        if (selfClosing || voidTags.contains(name))
          stack.last.children += Element(name, attrs, Vector.empty)
        else {
          if (stack.length >= limits.maxDepth)
            throw new BoundsExceeded("maxDepth")
          stack += new Open(name, attrs)
        }
      case TEnd(name, _, _) =>
        // find matching open element; ignore orphan end tags
        var idx = stack.length - 1
        while (idx > 0 && stack(idx).tag != name) idx -= 1
        if (idx > 0) while (stack.length > idx) closeTop()
    }

    def finish(): Element = {
      while (stack.length > 1) closeTop()
      Element("#root", Nil, stack.head.children.result())
    }
  }

  /** Build a DOM forest from tokens. Always returns a single synthetic
    * root Element("#root").
    */
  def build(tokens: Vector[Token], limits: Limits = Limits()): Element = {
    val b = new Builder(limits)
    tokens.foreach(b)
    b.finish()
  }

  /** Streaming parse: tokenizer feeds the DOM builder directly — no
    * intermediate token vector (hot path).
    */
  def parse(s: String, limits: Limits = Limits()): Element = {
    val b = new Builder(limits)
    HtmlTokenizer.scan(s)(b)
    b.finish()
  }
}
