package graft.extract

import graft.schema.Span
import graft.text.{Render, SpanOps}
import graft.tool.ToolSpans
import org.scalatest.funsuite.AnyFunSuite

class ToolSpansSpec extends AnyFunSuite {

  test("bash: prompts and exit frames dropped, output kept per line") {
    val t = "$ ls -la\ntotal 12\ndrwxr-x 2 root\n\nexit_code: 0"
    val (kind, spans) = ToolSpans.extract("bash", t)
    assert(kind == "tool")
    assert(Render.render(t, spans, kind) == "total 12\ndrwxr-x 2 root")
  }

  test("python: REPL prompts dropped") {
    val t = ">>> 1+1\n2\n>>> print('x')\nx"
    val (kind, spans) = ToolSpans.extract("python", t)
    assert(Render.render(t, spans, kind) == "2\nx")
  }

  test("search: titles and snippets kept, urls dropped") {
    val t = """{"results":[{"title":"Spark docs","url":"http://a",""" +
      """"snippet":"Unified engine"},{"title":"T2","url":"u2",""" +
      """"snippet":"S2 here"}]}"""
    val (kind, spans) = ToolSpans.extract("search", t)
    assert(kind == "tool_search")
    assert(Render.render(t, spans, kind) ==
      "Spark docs Unified engine\nT2 S2 here")
    // spans point into the raw payload
    assert(t.substring(spans(0).begin, spans(0).end) == "Spark docs")
  }

  test("search with broken json falls back to lines") {
    val t = "not json at all\nsecond line"
    val (kind, spans) = ToolSpans.extract("search", t)
    assert(kind == "tool")
    assert(Render.render(t, spans, kind) == "not json at all\nsecond line")
  }

  test("unknown tool keeps all non-blank lines") {
    val t = "a\n\n  \nb"
    val (kind, spans) = ToolSpans.extract("weird", t)
    assert(Render.render(t, spans, kind) == "a\nb")
  }
}

class ExtractorSpec extends AnyFunSuite {

  private val para =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("routing") {
    assert(Extractor.route("user", "", "hello world") == "plain")
    assert(Extractor.route("assistant", "", "<html><p>x</p>") == "html")
    assert(Extractor.route("user", "", "  <!DOCTYPE html><body>") == "html")
    assert(Extractor.route("tool", "bash", "x") == "tool")
    assert(Extractor.route("assistant", "search", "x") == "tool")
    assert(Extractor.route("user", "",
      """[{"page":0,"x0":0,"y0":0,"x1":1,"y1":1,"text":"t"}]""") == "pdf")
    assert(Extractor.route("user", "", "[1,2,3]") == "plain")
    assert(Extractor.route("user", "", "a < b and c > d") == "plain")
  }

  test("plain: paragraphs at blank lines, spans trimmed") {
    val t = "  first par\nstill first  \n\n  second par  \n\n\n"
    val ex = Extractor.extract("user", "", t)
    assert(ex.extractor == "plain")
    assert(ex.extracted_text == "first par still first\nsecond par")
    assert(ex.spans.map(s => t.substring(s.begin, s.end)) ==
      Seq("first par\nstill first", "second par"))
    assert(SpanOps.invariantsHold(ex.spans, t.length))
  }

  test("plain: empty and whitespace-only") {
    assert(Extractor.extract("user", "", "").extracted_text == "")
    assert(Extractor.extract("user", "", "  \n \t ").spans.isEmpty)
  }

  test("html end-to-end via router") {
    val html = s"<html><body><nav><a href='/'>Home</a></nav>" +
      s"<p>$para</p></body></html>"
    val ex = Extractor.extract("assistant", "", html)
    assert(ex.extractor == "html")
    assert(ex.extracted_text == para)
    assert(ex.error == "")
  }

  test("html bomb falls back to plain with error") {
    val bomb = "<p>" + ("<b>" * 300000)
    val ex = Extractor.extract("user", "", bomb)
    assert(ex.extractor == "plain")
    assert(ex.error.nonEmpty)
  }

  test("pdf parse error falls back to plain with error") {
    val bad = """[{"page":0,"x0":0,"text":"missing coords"}]"""
    val ex = Extractor.extract("user", "", bad)
    assert(ex.extractor == "plain")
    assert(ex.error.nonEmpty)
    assert(ex.extracted_text.nonEmpty)
  }

  test("null-safety") {
    val ex = Extractor.extract(null, null, null)
    assert(ex.extracted_text == "" && ex.spans.isEmpty)
  }

  test("consistency invariant: extracted_text == render(spans) always") {
    val cases = Seq(
      ("user", "", "plain text\n\nwith pars"),
      ("assistant", "", s"<div><p>$para</p><p>short</p></div>"),
      ("tool", "bash", "$ x\nout1\nout2"),
      ("tool", "search", """{"results":[{"title":"a b","snippet":"c"}]}"""),
      ("user", "",
        """[{"page":0,"x0":0,"y0":0,"x1":9,"y1":1,"text":"hi"}]"""),
      ("user", "", ""),
      ("user", "", "<p>&amp;&amp;&amp;</p>"))
    for ((role, tool, text) <- cases) {
      val ex = Extractor.extract(role, tool, text)
      assert(ex.extracted_text ==
        Render.render(if (text == null) "" else text, ex.spans,
          ex.extractor),
        s"inconsistent for $role/$tool")
    }
  }

  test("span invariants per extractor (pdf may reorder, others sorted)") {
    val html = s"<div><p>$para</p><ul><li>$para</li></ul></div>"
    val ex = Extractor.extract("u", "", html)
    assert(SpanOps.invariantsHold(ex.spans, html.length))
    val pdf = """[{"page":0,"x0":0,"y0":10,"x1":5,"y1":12,"text":"b"},""" +
      """{"page":0,"x0":0,"y0":0,"x1":5,"y1":2,"text":"a"}]"""
    val exp = Extractor.extract("u", "", pdf)
    // pdf spans are in reading order: disjoint + in-bounds but not
    // necessarily begin-sorted
    assert(exp.spans.map(_.begin).toSet.size == exp.spans.length)
    assert(exp.extracted_text == "a\nb")
  }

  test("COLLATE-1: degenerate primary falls back to plain") {
    def frame(t: String) =
      "<html><body><nav><a href='/'>Home</a> <a href='/x'>X</a></nav>" +
        s"<p>$t</p><footer><a href='/t'>tos</a></footer></body></html>"
    // long content: html primary accepted
    val long = (1 to 20).map(i => s"w$i").mkString(" ")
    val a = Extractor.extractCollated("assistant", "", frame(long))
    assert(a.extractor == "html" && a.extracted_text == long)
    // short content: boilerplate drops it -> plain fallback over raw
    val b = Extractor.extractCollated("assistant", "", frame("tiny text"))
    assert(b.extractor == "plain_fallback")
    assert(b.extracted_text.contains("tiny text") &&
      b.extracted_text.contains("<nav>"))
    // plain primary is always accepted, even when short
    val c = Extractor.extractCollated("user", "", "hi")
    assert(c.extractor == "plain" && c.extracted_text == "hi")
  }

  test("ensemble: weight order, first non-degenerate wins") {
    def frame(t: String) =
      "<html><body><nav><a href='/'>Home</a> <a href='/x'>X</a></nav>" +
        s"<p>$t</p><footer><a href='/t'>tos</a></footer></body></html>"
    val short = frame("tiny text")
    // html outranks plain but is degenerate here -> plain wins
    val a = Extractor.extractEnsemble(
      Seq(("html", 1.0), ("plain", 0.5)), "assistant", "", short)
    assert(a.extractor == "plain" && a.extracted_text.contains("tiny"))
    // plain outranks html by weight even when listed second
    val long = frame((1 to 20).map(i => s"w$i").mkString(" "))
    val b = Extractor.extractEnsemble(
      Seq(("html", 0.2), ("plain", 0.9)), "assistant", "", long)
    assert(b.extractor == "plain") // raw markup, but non-degenerate
    val c = Extractor.extractEnsemble(
      Seq(("html", 0.9), ("plain", 0.2)), "assistant", "", long)
    assert(c.extractor == "html")
    // all degenerate -> last tried returned
    val d = Extractor.extractEnsemble(
      Seq(("html", 1.0), ("plain", 0.5)), "assistant", "", frame(""))
    assert(d.extractor == "plain")
    // md is a first-class ensemble member: markers stripped when it
    // wins, and the plain fallback keeps them
    val mdPayload = "# Head line\n\n" +
      (1 to 10).map(i => s"w$i").mkString(" ") + "\n- item *x* here"
    val e = Extractor.extractEnsemble(
      Seq(("md", 0.9), ("plain", 0.2)), "user", "", mdPayload)
    assert(e.extractor == "md" &&
      e.extracted_text.startsWith("Head line") &&
      e.extracted_text.endsWith("item x here"))
  }
}
