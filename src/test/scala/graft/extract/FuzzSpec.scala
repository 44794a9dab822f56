package graft.extract

import graft.synth.SynthTranscripts.Rng
import graft.text.{Render, SpanOps}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz: the extractor must NEVER throw and must keep its invariants on
  * arbitrary hostile input — at 10^12 turns, every representable payload
  * eventually arrives. Seeded (deterministic), three generators:
  * random unicode soup, markup-biased soup, and structure-mutated
  * synthetic payloads.
  */
class FuzzSpec extends AnyFunSuite {

  private val markupChars =
    "<>&;/=\"'!-[]{}().,$#x0123456789 \t\n\rabcdefghijklmnop" +
      "qrstuvwxyzPASCRIPTstylenavdiv"

  private def randomSoup(r: Rng, n: Int): String = {
    val sb = new StringBuilder(n)
    for (_ <- 0 until n) {
      val c = r.nextInt(4) match {
        case 0 => markupChars.charAt(r.nextInt(markupChars.length))
        case 1 => (0x20 + r.nextInt(0x5F)).toChar
        case 2 => (r.nextInt(0xD7FF) + 1).toChar // BMP incl. CJK
        case _ => "<p><a &#x27; </div> {\"x0\": ".charAt(
          r.nextInt(26))
      }
      sb.append(c)
    }
    sb.toString
  }

  private def mutate(r: Rng, s: String): String = {
    if (s.isEmpty) return s
    r.nextInt(4) match {
      case 0 => s.substring(0, r.nextInt(s.length)) // truncate
      case 1 => // splice
        val i = r.nextInt(s.length); val j = r.nextInt(s.length)
        s.substring(0, math.min(i, j)) + s.substring(math.max(i, j))
      case 2 => // duplicate a window
        val i = r.nextInt(s.length)
        s.substring(0, i) + s.substring(i / 2, i) + s.substring(i)
      case _ => s.replace('>', ' ')
    }
  }

  private def check(role: String, tool: String, payload: String): Unit = {
    val ex = Extractor.extract(role, tool, payload)
    // invariants: render consistency, spans in bounds + disjoint
    assert(ex.extracted_text ==
      Render.render(payload, ex.spans, ex.extractor))
    for (s <- ex.spans) {
      assert(s.begin >= 0 && s.begin <= s.end &&
        s.end <= payload.length, s"span OOB: $s")
    }
    if (ex.extractor != "pdf") // pdf spans are reading-ordered
      assert(SpanOps.invariantsHold(ex.spans, payload.length))
    else {
      val sorted = SpanOps.sorted(ex.spans)
      assert(SpanOps.invariantsHold(sorted, payload.length))
    }
  }

  test("random soup never throws, invariants hold (2000 cases)") {
    val r = new Rng(2026)
    for (i <- 0 until 2000) {
      val payload = randomSoup(r, r.nextInt(2000))
      val role = Seq("user", "assistant", "tool", "")(r.nextInt(4))
      val tool = Seq("", "bash", "search", "python", "junk")(r.nextInt(5))
      check(role, tool, payload)
    }
  }

  test("mutated structured payloads never throw (1500 cases)") {
    val r = new Rng(777)
    import graft.synth.SynthTranscripts._
    for (i <- 0 until 500) {
      check("assistant", "", mutate(r, htmlPayload(r)))
      check("user", "", mutate(r, pdfPayload(r)))
      check("tool", toolNames(r.nextInt(3)),
        mutate(r, toolPayload(r, toolNames(r.nextInt(3)))))
    }
  }
}
