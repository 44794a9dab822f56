package graft.pdf

import graft.text.Render
import org.scalatest.funsuite.AnyFunSuite

class XyCutSpec extends AnyFunSuite {

  private def run(page: Int, x0: Double, y0: Double, x1: Double,
      y1: Double, text: String): String =
    s"""{"page":$page,"x0":$x0,"y0":$y0,"x1":$x1,"y1":$y1,""" +
      s""""text":"$text"}"""

  private def payload(runs: String*): String = runs.mkString("[", ",", "]")

  private def extract(p: String): String =
    Render.render(p, XyCut.extractSpans(p), "pdf")

  test("parses runs with source offsets") {
    val p = payload(run(0, 0, 0, 10, 2, "hello"))
    val rs = XyCut.parseRuns(p)
    assert(rs.length == 1)
    assert(p.substring(rs(0).srcBegin, rs(0).srcEnd) == "hello")
    assert(rs(0).page == 0 && rs(0).x1 == 10.0)
  }

  test("restores reading order from shuffled emission") {
    // three lines emitted out of order
    val p = payload(
      run(0, 0, 20, 50, 22, "third line"),
      run(0, 0, 0, 50, 2, "first line"),
      run(0, 0, 10, 50, 12, "second line"))
    assert(extract(p) == "first line\nsecond line\nthird line")
  }

  test("two-column layout: left column read before right") {
    // columns x:[0,40] and x:[60,100], each with two lines; the x-gap (20)
    // exceeds every y-gap, so the vertical cut wins.
    val p = payload(
      run(0, 60, 0, 100, 2, "R1"),
      run(0, 0, 0, 40, 2, "L1"),
      run(0, 60, 10, 100, 12, "R2"),
      run(0, 0, 10, 40, 12, "L2"))
    assert(extract(p) == "L1\nL2\nR1\nR2")
  }

  test("words on one line join with spaces") {
    val p = payload(
      run(0, 0, 0, 10, 2, "hello"),
      run(0, 30, 0, 40, 2, "again"),
      run(0, 12, 0, 28, 2, "world"))
    assert(extract(p) == "hello world again")
  }

  test("pages ordered ascending") {
    val p = payload(
      run(1, 0, 0, 10, 2, "page1"),
      run(0, 0, 0, 10, 2, "page0"))
    assert(extract(p) == "page0\npage1")
  }

  test("json escapes decoded in rendered text, spans point at source") {
    val p = payload(run(0, 0, 0, 10, 2, """say \"hi\""""))
    val spans = XyCut.extractSpans(p)
    assert(extract(p) == "say \"hi\"")
    assert(p.substring(spans(0).begin, spans(0).end) == """say \"hi\"""")
  }

  test("malformed payload raises PdfParseError") {
    intercept[XyCut.PdfParseError](XyCut.parseRuns("[{]"))
    intercept[XyCut.PdfParseError](XyCut.parseRuns("""[{"page":0}]"""))
    intercept[XyCut.PdfParseError](XyCut.parseRuns("{}"))
  }

  test("empty array yields no spans") {
    assert(XyCut.extractSpans("[]").isEmpty)
  }

  test("header above columns is read first") {
    // header spanning full width, then two columns
    val p = payload(
      run(0, 0, 0, 100, 2, "HEADER"),
      run(0, 60, 10, 100, 12, "right"),
      run(0, 0, 10, 40, 12, "left"))
    assert(extract(p) == "HEADER\nleft\nright")
  }
}
