package graft.html

import graft.schema.Span
import graft.text.{Entities, Normalizer, Render}

/** Frozen boilerplate spec BOIL-1: Boilerpipe-style block segmentation +
  * the published NumWordsRulesClassifier decision tree (Kohlschuetter et
  * al., "Boilerplate Detection using Shallow Text Features", WSDM 2010),
  * with a tag-path trie pre-filter for structural boilerplate containers.
  *
  * The walk is the forward analogue of the reference's layout generator
  * (vkit/pipeline/text_detection/page_layout.py:400-594 samples text lines
  * into a page; we classify text blocks back out of markup).
  */
object Boilerplate {

  /** Subtrees that never contribute content (structural boilerplate). */
  val skipPaths: TagPathTrie = {
    val t = new TagPathTrie
    for (tag <- Seq("script", "style", "noscript", "template", "head",
      "nav", "aside", "footer", "header", "form", "button", "select",
      "option", "iframe", "svg", "object", "embed", "textarea", "title"))
      t.add(tag)
    t
  }

  /** Tags that delimit text blocks. */
  val blockTags: Set[String] = Set(
    "p", "div", "section", "article", "main", "body", "html", "ul", "ol",
    "li", "table", "thead", "tbody", "tfoot", "tr", "td", "th", "h1",
    "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "dl", "dt", "dd",
    "figure", "figcaption", "details", "summary", "address", "center",
    "fieldset", "legend")

  /** Tags that force a block break but carry no subtree. */
  val breakTags: Set[String] = Set("br", "hr")

  final case class TextBlock(
      spans: Vector[Span], // raw offsets; head kind=block, rest cont
      text: String, // rendered (decoded + collapsed)
      numWords: Int,
      anchorWords: Int,
      path: String) {
    def linkDensity: Double =
      if (numWords == 0) 0.0 else anchorWords.toDouble / numWords
  }

  /** Simple prefix trie over reversed tag paths: a block is skipped when
    * ANY ancestor tag chain matches a rule. Rules here are single tags but
    * the trie supports multi-segment paths (e.g. "div/ul" for nav menus).
    */
  final class TagPathTrie {
    private val root = new TrieNode
    // single-segment rules get an O(1) set probe — matchesTag runs once
    // per element on the hot path and the general suffix walk allocates
    private val singles = new java.util.HashSet[String]()
    private final class TrieNode {
      val kids = scala.collection.mutable.HashMap[String, TrieNode]()
      var terminal = false
    }
    def add(path: String): Unit = {
      var n = root
      val segs = path.split('/')
      for (seg <- segs) n = n.kids.getOrElseUpdate(seg, new TrieNode)
      n.terminal = true
      if (segs.length == 1) singles.add(segs(0))
    }
    /** Does any suffix of `path` starting at some ancestor match a rule?
      * We check every position: path segments are matched downward.
      */
    def matchesAnywhere(path: Seq[String]): Boolean = {
      var i = 0
      while (i < path.length) {
        var n = root
        var j = i
        var ok = true
        while (ok && !n.terminal && j < path.length) {
          n.kids.get(path(j)) match {
            case Some(k) => n = k; j += 1
            case None    => ok = false
          }
        }
        if (ok && n.terminal) return true
        i += 1
      }
      false
    }
    def matchesTag(tag: String): Boolean =
      singles.contains(tag) || matchesAnywhere(Seq(tag))
  }

  private def countWords(s: String): Int = {
    var words = 0
    var inWord = false
    var i = 0
    while (i < s.length) {
      val ws = Normalizer.isWs(s.charAt(i))
      if (!ws && !inWord) { words += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    words
  }

  /** Segment the DOM into text blocks. */
  def segment(raw: String, root: Dom.Element): Vector[TextBlock] = {
    val blocks = Vector.newBuilder[TextBlock]
    val curSpans = Vector.newBuilder[Span]
    var curAnchorWords = 0
    var curCount = 0
    var curPath = ""
    val pathStack = scala.collection.mutable.ArrayBuffer[String]()
    var anchorDepth = 0

    val curParts = new java.lang.StringBuilder

    def flush(): Unit = {
      val spans0 = curSpans.result()
      if (spans0.nonEmpty) {
        val spans = spans0.zipWithIndex.map { case (s, i) =>
          Span(s.begin, s.end, if (i == 0) "block" else "cont")
        }
        // decode happened once in the walk; wsCollapse(concat(decoded))
        // here equals Render.blockText(raw, spans, "html") by
        // construction (same decode, "" joiner) — asserted in tests
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

    def walk(n: Dom.Node): Unit = n match {
      case Dom.Text(b, e) =>
        // decode straight into the block buffer (no substring); roll
        // back nodes that decode to pure whitespace (they contribute
        // neither spans nor text — frozen BOIL-1 semantics)
        val mark = curParts.length()
        val nonBlank = Entities.decodeAppend(curParts, raw, b, e)
        if (!nonBlank) curParts.setLength(mark)
        else {
          if (curCount == 0) curPath = pathStack.mkString("/")
          curSpans += Span(b, e, "cont")
          curCount += 1
          if (anchorDepth > 0)
            curAnchorWords += countWords(curParts.substring(mark))
        }
      case el @ Dom.Element(tag, _, children) =>
        if (tag == "#root") children.foreach(walk)
        else if (skipPaths.matchesTag(tag)) () // prune subtree
        else if (breakTags.contains(tag)) flush()
        else {
          val isBlock = blockTags.contains(tag)
          if (isBlock) flush()
          pathStack += tag
          if (tag == "a") anchorDepth += 1
          children.foreach(walk)
          if (tag == "a") anchorDepth -= 1
          pathStack.remove(pathStack.length - 1)
          if (isBlock) flush()
        }
    }
    walk(root)
    flush()
    blocks.result()
  }

  /** The published NumWordsRulesClassifier decision tree (public
    * Boilerpipe knowledge). true = content.
    */
  def isContent(prev: TextBlock, curr: TextBlock, next: TextBlock): Boolean =
    if (curr.linkDensity > 0.333333) false
    else if (prev.linkDensity <= 0.555556) {
      if (curr.numWords > 16) true
      else if (next.numWords > 15) true
      else prev.numWords > 4
    } else {
      if (curr.numWords > 40) true
      else next.numWords > 17
    }

  private val emptyBlock = TextBlock(Vector.empty, "", 0, 0, "")

  /** Classify blocks; returns (contentSpans, contentBlocks). */
  def classify(blocks: Vector[TextBlock]): Vector[TextBlock] =
    blocks.zipWithIndex.collect {
      case (b, i) if isContent(
        if (i > 0) blocks(i - 1) else emptyBlock,
        b,
        if (i + 1 < blocks.length) blocks(i + 1) else emptyBlock) => b
    }

  /** Full HTML main-content extraction: (extracted text, spans into the
    * raw payload). The text comes from the blocks' single rendering pass
    * and equals Render.render(raw, spans, "html") by construction
    * (asserted by the extractor consistency tests).
    *
    * Hot path: one streaming pass (tokenizer -> StreamSegmenter), no
    * DOM materialization; StreamSegmenter ≡ segment(Dom.parse(raw)) is
    * property-tested in BoilerplateSpec.
    */
  def extract(raw: String,
      limits: Dom.Limits = Dom.Limits()): (String, Vector[Span]) = {
    val content = classify(StreamSegmenter.segment(raw, limits))
    (content.iterator.map(_.text).mkString("\n"),
      content.flatMap(_.spans))
  }

  /** Spans-only variant. */
  def extractSpans(raw: String,
      limits: Dom.Limits = Dom.Limits()): Vector[Span] =
    extract(raw, limits)._2
}
