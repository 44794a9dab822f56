package graft.md

import graft.extract.Extractor
import graft.text.Render
import org.scalatest.funsuite.AnyFunSuite

class MarkdownSpec extends AnyFunSuite {

  private def extract(payload: String) =
    Extractor.extract("user", "", payload)

  test("routing: ATX heading + structural marker routes to md; a " +
    "heading alone stays plain; html/pdf sniffs win") {
    assert(Extractor.route("user", "", "# T\n- a") == "md")
    assert(Extractor.route("user", "", "# T\n```\nx\n```") == "md")
    assert(Extractor.route("user", "", "# T\nno markers") == "plain")
    assert(Extractor.route("user", "", "<p># T</p>\n- a") == "html")
    assert(Extractor.route("tool", "bash", "# T\n- a") == "tool")
  }

  test("headings and items strip their markers; emphasis asterisks " +
    "are excluded; non-markers are content") {
    val ex = extract(
      "# Title words\n\npara line\n## Sub *head*\n- item one\n" +
        "- *two* starred\n#tag stays\n-dash stays\n2 * 3\n***\nmixed *a*b*c*")
    assert(ex.extractor == "md" && ex.error == "")
    assert(ex.extracted_text ==
      "Title words\npara line\nSub head\nitem one\ntwo starred\n" +
        "#tag stays\n-dash stays\n2 3\nmixed abc")
  }

  test("code fences: markers dropped, content verbatim incl. asterisk/" +
    "hash/dash chars; unterminated fence runs to EOF") {
    val ex = extract(
      "# C\n\n```\nkeep *stars* # hash - dash\n\nsecond\n```\nafter\n" +
        "```\ntail one\ntail two")
    assert(ex.extracted_text ==
      "C\nkeep *stars* # hash - dash\nsecond\nafter\ntail one\ntail two")
  }

  test("seven hashes is not a heading; six is; '# ' required") {
    val ex = extract("# ok\n\n###### six deep\n####### seven deep\n- x")
    assert(ex.extracted_text ==
      "ok\nsix deep\n####### seven deep\nx")
  }

  test("RENDER-1: extracted_text == render(payload, spans, kind), and " +
    "spans are sorted, in-bounds, non-overlapping, marker-free") {
    val payloads = Seq(
      "# a\n- b *c* d\n```\ne*f\n```",
      "# x\n\n*\n***\n- \n- *\n##nospace\n```\n```\n# after empty fence",
      "# only heading\n- tail")
    for (p <- payloads) {
      val ex = extract(p)
      assert(ex.extracted_text == Render.render(p, ex.spans, ex.extractor))
      var prev = 0
      for (s <- ex.spans) {
        assert(s.begin >= prev && s.end > s.begin && s.end <= p.length)
        prev = s.end
        val body = p.substring(s.begin, s.end)
        assert(!body.contains('*') ||
          ex.spans.indexOf(s) == -2 || isCode(p, s.begin),
          s"markup leaked in '$body'")
      }
    }
  }

  /** True when offset sits inside a fenced region of `p` (linear
    * re-scan, test-only).
    */
  private def isCode(p: String, off: Int): Boolean = {
    var inCode = false
    var ls = 0
    while (ls <= off && ls <= p.length) {
      var le = p.indexOf('\n', ls)
      if (le < 0) le = p.length
      if (le - ls >= 3 && p.startsWith("```", ls)) inCode = !inCode
      else if (ls <= off && off < le) return inCode
      ls = le + 1
    }
    inCode
  }
}
