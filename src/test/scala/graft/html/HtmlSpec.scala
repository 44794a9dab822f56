package graft.html

import graft.schema.Span
import graft.text.Render
import org.scalatest.funsuite.AnyFunSuite
import HtmlTokenizer._

class TokenizerSpec extends AnyFunSuite {

  private def toks(s: String) = tokenize(s)

  test("text and simple tags with offsets") {
    val s = "pre<p class='x'>hi</p>post"
    val t = toks(s)
    assert(t == Vector(
      TText(0, 3),
      TStart("p", List(("class", "x")), false, 3, 16),
      TText(16, 18),
      TEnd("p", 18, 22),
      TText(22, 26)))
  }

  test("attributes: quoted, unquoted, bare, self-closing") {
    val s = """<img src="a.png" alt=plain disabled/>"""
    val Vector(st: TStart) = toks(s): @unchecked
    assert(st.name == "img" && st.selfClosing)
    assert(st.attrs == List(("src", "a.png"), ("alt", "plain"),
      ("disabled", "")))
  }

  test("comments, doctype, processing instructions skipped") {
    val s = "<!doctype html><!-- c <p> --><?xml?>x"
    val t = toks(s)
    assert(t == Vector(TSkip(0, 15), TSkip(15, 29), TSkip(29, 36),
      TText(36, 37)))
  }

  test("rawtext: script content not parsed as tags") {
    val s = "<script>if (a<b) { x(\"</div>\") }</script>t"
    val t = toks(s)
    assert(t(0).isInstanceOf[TStart])
    val TText(b, e) = t(1): @unchecked
    // raw text runs to the first real "</script" close tag
    assert(s.substring(b, e) == "if (a<b) { x(\"</div>\") }")
  }

  test("rawtext close tag case-insensitive") {
    val s = "<STYLE>p{}</StYlE>x"
    val t = toks(s)
    assert(t.exists { case TEnd("style", _, _) => true; case _ => false })
    assert(t.last == TText(18, 19))
  }

  test("stray < and unterminated tags survive") {
    assert(toks("a < b") == Vector(TText(0, 2), TText(2, 3), TText(3, 5)))
    val t = toks("x<p")
    assert(t.head == TText(0, 1))
    assert(t(1).isInstanceOf[TStart])
    assert(toks("<") == Vector(TText(0, 1)))
  }

  test("unterminated comment consumes rest") {
    assert(toks("a<!-- open") == Vector(TText(0, 1), TSkip(1, 10)))
  }

  test("maxTokens bound") {
    val bomb = "<b>" * 100
    intercept[BoundsExceeded](tokenize(bomb, maxTokens = 10))
  }
}

class DomSpec extends AnyFunSuite {
  import Dom._

  test("builds nested tree") {
    val root = parse("<div><p>a</p><p>b</p></div>")
    val Vector(div: Element) = root.children: @unchecked
    assert(div.tag == "div")
    assert(div.children.map { case e: Element => e.tag; case _ => "#t" } ==
      Vector("p", "p"))
  }

  test("auto-close p on new p and div") {
    val root = parse("<p>a<p>b<div>c</div>")
    val tags = root.children.collect { case e: Element => e.tag }
    assert(tags == Vector("p", "p", "div"))
  }

  test("li auto-closes li") {
    val root = parse("<ul><li>a<li>b</ul>")
    val Vector(ul: Element) = root.children: @unchecked
    assert(ul.children.collect { case e: Element => e.tag } ==
      Vector("li", "li"))
  }

  test("void elements don't nest") {
    val root = parse("<p>a<br>b</p>")
    val Vector(p: Element) = root.children: @unchecked
    assert(p.children.length == 3)
  }

  test("orphan end tags ignored; unclosed tags closed at EOF") {
    val root = parse("</b><div>x")
    val Vector(div: Element) = root.children: @unchecked
    assert(div.tag == "div" && div.children.length == 1)
  }

  test("mismatched end tag pops to match") {
    val root = parse("<div><b>x</div>y")
    val tags = root.children.collect { case e: Element => e.tag }
    assert(tags == Vector("div"))
  }

  test("maxDepth bound") {
    val deep = "<div>" * 300
    intercept[BoundsExceeded](parse(deep))
  }
}

class BoilerplateSpec extends AnyFunSuite {

  private def extract(html: String): (String, Vector[Span]) = {
    val spans = Boilerplate.extractSpans(html)
    (Render.render(html, spans, "html"), spans)
  }

  private val content20 =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("strips script/style/nav/footer, keeps long paragraph") {
    val html =
      s"""<html><head><title>T</title><script>var x=1;</script></head>
         |<body><nav><a href="/">Home</a> <a href="/a">About</a></nav>
         |<p>$content20</p>
         |<footer>copyright foo bar baz qux quux corge grault</footer>
         |</body></html>""".stripMargin
    val (text, spans) = extract(html)
    assert(text == content20)
    assert(spans.nonEmpty)
    for (s <- spans) assert(html.substring(s.begin, s.end).contains("alpha"))
  }

  test("link-density: link farm dropped even when long") {
    val links = (1 to 30).map(i => s"""<a href="/$i">link number $i</a>""")
      .mkString(" ")
    // after a high-link-density block the published tree requires >40
    // words for immediate content (its "prev looks like nav" branch)
    val content45 = (content20 + " ") * 2 + "one two three four five"
    val html = s"<div>$links</div><p>$content45</p>"
    val (text, _) = extract(html)
    assert(text == graft.text.Normalizer.wsCollapse(content45))
  }

  test("entities decoded in content") {
    val body = ("w" * 1).toString
    val para = s"Tom &amp; Jerry &lt;3 caf&eacute; " + content20
    val html = s"<p>$para</p>"
    val (text, _) = extract(html)
    assert(text == "Tom & Jerry <3 café " + content20)
  }

  test("short isolated block is boilerplate (NumWordsRules)") {
    val html = s"<p>tiny</p><p>$content20</p><p>also tiny</p>"
    val (text, _) = extract(html)
    // 'tiny' (1 word, next=20 words>15 => content!) — per the published
    // tree, a short block right before long content IS kept.
    assert(text.contains(content20))
  }

  test("empty and boilerplate-only html yields empty") {
    assert(extract("<html><body></body></html>")._1 == "")
    assert(extract("<nav><a href='/'>Home</a></nav>")._1 == "")
    val (t, s) = extract("<p>   </p>")
    assert(t == "" && s.isEmpty)
  }

  test("inline tags join without space; br splits blocks") {
    val w15 = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen"
    val html = s"<p>$w15 foo<b>bar</b> $w15</p>"
    val (text, _) = extract(html)
    assert(text == s"$w15 foobar $w15")
  }

  test("spans render-consistency and invariants") {
    val html = s"<div><p>$content20</p><ul><li>$content20</li>" +
      s"<li>$content20 extra words here</li></ul></div>"
    val spans = Boilerplate.extractSpans(html)
    assert(graft.text.SpanOps.invariantsHold(spans, html.length))
  }

  test("property: streaming segmenter equals DOM-walk segmentation") {
    val r = new graft.synth.SynthTranscripts.Rng(99)
    val adversarial = Seq(
      "<p/>text after self-closed block<p>real para here</p>",
      "<div><script>var a = '<p>x</p>';</script>content words</div>",
      "<a href='/'><div>block inside anchor</div></a>",
      "<ul><li>one<li>two<li>three</ul>trailing",
      "</p>orphan end<p>then content",
      "<p>a<p>b<p>c", // auto-close chain
      "<nav><p>skipped block</p></nav><p>kept</p>",
      "<br><br><hr>between breaks",
      "<P CLASS='X'>uppercase</P>",
      "<div>unclosed <b>bold <i>italic",
      "text&amp;<p>more&#65;here</p>",
      "<textarea><p>not parsed</p></textarea>after",
      "")
    val samples = adversarial ++
      (0 until 300).map(_ => graft.synth.SynthTranscripts.htmlPayload(r))
    for (html <- samples) {
      val viaDom = Boilerplate.segment(html, Dom.parse(html))
      val viaStream = StreamSegmenter.segment(html)
      assert(viaDom == viaStream,
        s"segmentation mismatch for: ${html.take(120)}")
    }
  }

  test("tag path trie matches nested rules") {
    val t = new Boilerplate.TagPathTrie
    t.add("div/ul")
    assert(t.matchesAnywhere(Seq("body", "div", "ul")))
    assert(!t.matchesAnywhere(Seq("body", "ul")))
    assert(t.matchesAnywhere(Seq("div", "ul", "li")))
  }
}
