package graft.text

import graft.schema.Span
import org.scalatest.funsuite.AnyFunSuite

class NormalizerSpec extends AnyFunSuite {
  import Normalizer._

  test("collapse runs, trim edges") {
    assert(wsCollapse("  foo   bar\t\nbaz  ") == "foo bar baz")
    assert(wsCollapse("") == "")
    assert(wsCollapse(" \t\n ") == "")
    assert(wsCollapse("x") == "x")
  }

  test("NBSP family is whitespace") {
    assert(wsCollapse("a\u00A0\u2007\u202F\uFEFFb") == "a b")
    assert(isBlank(" \u00A0\u3000\t"))
  }

  test("fullwidth ASCII maps to halfwidth") {
    assert(wsCollapse("Ａｂ１！") == "Ab1!")
    // ideographic space U+3000 collapses
    assert(wsCollapse("你　好") == "你 好")
  }
}

class EntitiesSpec extends AnyFunSuite {
  import Entities._

  test("named entities") {
    assert(decode("a &amp; b &lt;c&gt; &quot;d&quot; &apos;") ==
      "a & b <c> \"d\" '")
    assert(decode("x&nbsp;y") == "x y")
    assert(decode("&mdash;&hellip;") == "—…")
  }

  test("numeric entities dec and hex") {
    assert(decode("&#65;&#x42;&#X43;") == "ABC")
    assert(decode("&#x27;") == "'")
    assert(decode("&#8212;") == "—")
    assert(decode("&#x1F600;") == new String(Character.toChars(0x1F600)))
  }

  test("ENT-2: full WHATWG table") {
    assert(Entities.namedCount == 2125 && Entities.legacyCount == 106)
    assert(decode("&euro;&pound;&sect;&alpha;&rarr;") ==
      "€£§α→")
    assert(decode("&forall;&ne;&le;&infin;&part;") ==
      "∀≠≤∞∂")
    // multi-codepoint entity
    assert(decode("&NotEqualTilde;") == "≂̸")
    // longest-match: &notin; is its own entity, not &not + "in;"
    assert(decode("&notin;") == "∉")
  }

  test("ENT-2: semicolon-less legacy forms, longest-prefix") {
    assert(decode("&amp") == "&")
    assert(decode("100 &amp 200") == "100 & 200")
    assert(decode("&copy 2024") == "© 2024")
    assert(decode("&ampx") == "&x") // maximal table match is 'amp'
    assert(decode("&eacutex") == "éx")
    // not a legacy form -> needs the ';' -> verbatim
    assert(decode("&alpha beta") == "&alpha beta")
  }

  test("ENT-2: numeric refs with optional ';', windows-1252 override") {
    // missing ';' still decodes (spec), stops at the first non-digit
    assert(decode("&#65 x") == "A x")
    // C1 range maps through the spec's windows-1252 override
    assert(decode("&#128;&#146;&#153;") == "€’™")
  }

  test("malformed references pass through") {
    assert(decode("&unknown; &zzz") == "&unknown; &zzz")
    assert(decode("a & b") == "a & b")
    assert(decode("&#xZZ;") == "&#xZZ;")
    assert(decode("&#0;&#x110000;") == "&#0;&#x110000;")
    assert(decode("&;") == "&;")
  }

  test("no entities returns same instance") {
    val s = "plain"
    assert(decode(s) eq s)
  }
}

class SpanOpsSpec extends AnyFunSuite {
  import SpanOps._
  private def sp(b: Int, e: Int) = Span(b, e, "block")

  test("union merges overlapping and touching") {
    assert(union(Seq(sp(0, 5), sp(10, 12)), Seq(sp(4, 10))) ==
      Seq(sp(0, 12)))
    assert(union(Seq(sp(0, 2)), Seq(sp(3, 4))) == Seq(sp(0, 2), sp(3, 4)))
  }

  test("intersect") {
    assert(intersect(Seq(sp(0, 10)), Seq(sp(5, 15))) == Seq(sp(5, 10)))
    assert(intersect(Seq(sp(0, 3)), Seq(sp(3, 6))) == Seq())
    assert(intersect(Seq(sp(0, 10), sp(20, 30)), Seq(sp(5, 25))) ==
      Seq(sp(5, 10), sp(20, 25)))
  }

  test("subtract") {
    assert(subtract(Seq(sp(0, 10)), Seq(sp(3, 5))) ==
      Seq(sp(0, 3), sp(5, 10)))
    assert(subtract(Seq(sp(0, 10)), Seq(sp(0, 10))) == Seq())
    assert(subtract(Seq(sp(0, 10)), Seq()) == Seq(sp(0, 10)))
    assert(subtract(Seq(sp(5, 8)), Seq(sp(0, 20))) == Seq())
  }

  test("bounding fold") {
    assert(bounding(Seq(sp(3, 5), sp(1, 2), sp(8, 9))) == Some(sp(1, 9)))
    assert(bounding(Seq()) == None)
  }

  test("unionize with provenance maps every input to its merged span") {
    val in = Seq(sp(10, 12), sp(0, 3), sp(2, 5), sp(11, 14), sp(20, 21))
    val (merged, prov) = unionizeWithProvenance(in)
    assert(merged == Seq(sp(0, 5), sp(10, 14), sp(20, 21)))
    assert(prov == Seq(1, 0, 0, 1, 2))
    assert(unionizeWithProvenance(Seq()) == ((Seq(), Seq())))
  }

  test("dilate expands, clips, and merges") {
    // +-2 context windows; middle spans merge, ends clip
    assert(dilate(Seq(sp(1, 3), sp(6, 8), sp(20, 22)), 2, 23) ==
      Seq(sp(0, 10), sp(18, 23)))
    assert(dilate(Seq(sp(4, 6)), 0, 100) == Seq(sp(4, 6)))
    assert(dilate(Seq(), 3, 10) == Seq())
  }

  test("anyOverlap") {
    assert(anyOverlap(Seq(sp(0, 5)), Seq(sp(4, 6))))
    assert(!anyOverlap(Seq(sp(0, 5)), Seq(sp(5, 6))))
  }

  test("invariantsHold") {
    assert(invariantsHold(Seq(sp(0, 2), sp(2, 4)), 4))
    assert(!invariantsHold(Seq(sp(2, 4), sp(0, 2)), 4))
    assert(!invariantsHold(Seq(sp(0, 5)), 4))
    assert(!invariantsHold(Seq(sp(-1, 2)), 4))
  }

  // seeded property loops (deterministic; scalacheck-style but offline)
  private def randSpans(r: java.util.Random): Seq[Span] =
    Seq.fill(r.nextInt(12)) {
      val b = r.nextInt(100); sp(b, b + 1 + r.nextInt(20))
    }

  test("property: union is merged, sorted, disjoint and covers inputs") {
    val r = new java.util.Random(42)
    for (_ <- 0 until 500) {
      val a = randSpans(r); val b = randSpans(r)
      val u = union(a, b)
      assert(u.sliding(2).forall {
        case Seq(x, y) => x.end < y.begin
        case _         => true
      })
      for (s <- a ++ b)
        assert(u.exists(m => m.begin <= s.begin && s.end <= m.end))
    }
  }

  test("property: a = (a intersect b) union (a subtract b)") {
    val r = new java.util.Random(7)
    for (_ <- 0 until 500) {
      val a = randSpans(r); val b = randSpans(r)
      val lhs = mergeTouching(sorted(a))
      val rhs = union(intersect(a, b), subtract(a, b))
      def pts(s: Seq[Span]) =
        s.flatMap(x => x.begin until x.end).toSet
      assert(pts(lhs) == pts(rhs))
    }
  }
}

class JsonSpec extends AnyFunSuite {
  import Json._

  test("parses values and records string offsets") {
    val src = """{"a": [1, -2.5e1], "b": "hi\nthere", "c": null}"""
    val JObj(f) = parse(src): @unchecked
    val o = JObj(f)
    assert(o.get("a").contains(JArr(Vector(JNum(1), JNum(-25.0)))))
    val Some(JStr(v, b, e)) = o.get("b"): @unchecked
    assert(v == "hi\nthere")
    assert(src.substring(b, e) == "hi\\nthere")
    assert(o.get("c").contains(JNull))
  }

  test("unicode escapes") {
    val JStr(v, _, _) = parse("\"\\u0041\\u00e9\""): @unchecked
    assert(v == "Aé")
  }

  test("rejects malformed") {
    intercept[ParseError](parse("{"))
    intercept[ParseError](parse("[1,]2"))
    intercept[ParseError](parse("""{"a" 1}"""))
    intercept[ParseError](parse(""))
  }

  test("unescape on raw slice") {
    assert(unescape("a\\tb\\\\c\\u0021") == "a\tb\\c!")
    assert(unescape("plain") == "plain")
  }
}

class RenderSpec extends AnyFunSuite {
  test("blocks grouping and joiners") {
    val raw = "hello <b>world</b> &amp; you"
    val spans = Seq(Span(0, 6, "block"), Span(9, 14, "cont"),
      Span(18, 28, "cont"))
    assert(Render.render(raw, spans, "html") == "hello world & you")
  }

  test("pdf joiner and unescape") {
    val raw = """[{"text":"foo\nx"},{"text":"bar"}]"""
    val s1 = Span(10, 16, "block") // foo\nx (escaped source)
    val s2 = Span(28, 31, "cont") // bar
    assert(raw.substring(10, 16) == "foo\\nx")
    assert(raw.substring(28, 31) == "bar")
    assert(Render.render(raw, Seq(s1, s2), "pdf") == "foo x bar")
  }

  test("empty blocks dropped") {
    val raw = "a   \t   b"
    val spans = Seq(Span(0, 1, "block"), Span(1, 8, "block"),
      Span(8, 9, "block"))
    assert(Render.render(raw, spans, "plain") == "a\nb")
  }
}
