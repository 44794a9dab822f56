package graft.html

import graft.schema.Span
import graft.text.{Entities, Normalizer}
import HtmlTokenizer._
import Boilerplate.TextBlock

/** Streaming block segmentation: consumes the token stream directly and
  * produces exactly the TextBlocks of `Boilerplate.segment(Dom.parse(s))`
  * without materializing DOM nodes (hot path: tokenizer -> segmenter is
  * one pass, zero tree allocation). Equivalence with the DOM walk is
  * property-tested over the synthetic payload space (BoilerplateSpec).
  *
  * The stack discipline (auto-close, void tags, orphan end tags, close-
  * to-match) mirrors Dom.Builder exactly; entry/exit effects (block
  * flush, skip masking, anchor depth) mirror Boilerplate.segment's DFS,
  * which visits text in document order — the same order tokens arrive.
  */
final class StreamSegmenter(raw: String, limits: Dom.Limits)
    extends (Token => Unit) {

  // per-open-element record: tag + which effects were applied at push
  private final class Open(val tag: String, val isSkip: Boolean,
      val isBlock: Boolean, val isAnchor: Boolean)

  private val stack = new scala.collection.mutable.ArrayBuffer[Open]
  stack += new Open("#root", false, false, false)

  private var nodes = 0
  private var skipDepth = 0
  private var anchorDepth = 0

  private val blocks = Vector.newBuilder[TextBlock]
  private val curSpans = Vector.newBuilder[Span]
  private val curParts = new java.lang.StringBuilder
  private var curAnchorWords = 0
  private var curCount = 0
  private var curPath = ""

  private def countNode(): Unit = {
    nodes += 1
    if (nodes > limits.maxNodes) throw new BoundsExceeded("maxNodes")
  }

  private def countWords(s: String): Int = countWordsCs(s, 0, s.length)

  private def countWordsCs(cs: CharSequence, from: Int,
      until: Int): Int = {
    var words = 0
    var inWord = false
    var i = from
    while (i < until) {
      val ws = Normalizer.isWs(cs.charAt(i))
      if (!ws && !inWord) { words += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    words
  }

  private def flush(): Unit = {
    val spans0 = curSpans.result()
    if (spans0.nonEmpty) {
      val spans = spans0.zipWithIndex.map { case (s, i) =>
        Span(s.begin, s.end, if (i == 0) "block" else "cont")
      }
      val text = Normalizer.wsCollapse(curParts.toString)
      if (text.nonEmpty)
        blocks += TextBlock(spans, text, countWords(text),
          curAnchorWords, curPath)
    }
    curSpans.clear()
    curParts.setLength(0)
    curAnchorWords = 0
    curCount = 0
  }

  /** Entry effects for an element (same priority order as the DOM walk:
    * skip > break > block). Returns the Open record.
    */
  private def pushEffects(tag: String): Open = {
    val isSkip = Boilerplate.skipPaths.matchesTag(tag)
    if (isSkip) { skipDepth += 1; return new Open(tag, true, false, false) }
    if (skipDepth > 0) return new Open(tag, false, false, false)
    val isBlock = Boilerplate.blockTags.contains(tag)
    if (isBlock) flush()
    val isAnchor = tag == "a"
    if (isAnchor) anchorDepth += 1
    new Open(tag, false, isBlock, isAnchor)
  }

  private def popTop(): Unit = {
    val top = stack.remove(stack.length - 1)
    if (top.isSkip) skipDepth -= 1
    else if (skipDepth == 0) {
      if (top.isAnchor) anchorDepth -= 1
      if (top.isBlock) flush()
    } else {
      // closed inside a skipped subtree: effects were never applied
      if (top.isAnchor) anchorDepth -= 1
      if (top.isBlock) () // no flush inside skip (no content collected)
    }
  }

  def apply(tok: Token): Unit = tok match {
    case TText(b, e) =>
      countNode()
      if (skipDepth == 0) {
        val mark = curParts.length()
        val nonBlank = Entities.decodeAppend(curParts, raw, b, e)
        if (!nonBlank) curParts.setLength(mark)
        else {
          if (curCount == 0)
            curPath = stack.iterator.drop(1).map(_.tag).mkString("/")
          curSpans += Span(b, e, "cont")
          curCount += 1
          if (anchorDepth > 0) // count in place — no substring alloc
            curAnchorWords += countWordsCs(curParts, mark,
              curParts.length)
        }
      }
    case TSkip(_, _) => ()
    case TStart(name, _, selfClosing, _, _) =>
      countNode()
      Dom.autoClose.get(name).foreach { closes =>
        while (stack.length > 1 && closes.contains(stack.last.tag))
          popTop()
      }
      if (selfClosing || Dom.voidTags.contains(name)) {
        // empty element: entry+exit effects collapse — break tags and
        // (self-closed) block tags flush; skip/anchor effects cancel
        if (skipDepth == 0 &&
          !Boilerplate.skipPaths.matchesTag(name) &&
          (Boilerplate.breakTags.contains(name) ||
            Boilerplate.blockTags.contains(name))) flush()
      } else {
        if (stack.length >= limits.maxDepth)
          throw new BoundsExceeded("maxDepth")
        stack += pushEffects(name)
      }
    case TEnd(name, _, _) =>
      var idx = stack.length - 1
      while (idx > 0 && stack(idx).tag != name) idx -= 1
      if (idx > 0) while (stack.length > idx) popTop()
  }

  def finish(): Vector[TextBlock] = {
    while (stack.length > 1) popTop()
    flush()
    blocks.result()
  }
}

object StreamSegmenter {
  /** One-pass tokenizer -> segmenter (no DOM, no attr allocation). */
  def segment(raw: String,
      limits: Dom.Limits = Dom.Limits()): Vector[TextBlock] = {
    val seg = new StreamSegmenter(raw, limits)
    HtmlTokenizer.scan(raw, keepAttrs = false)(seg)
    seg.finish()
  }
}
