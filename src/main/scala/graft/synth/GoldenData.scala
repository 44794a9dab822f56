package graft.synth

import graft.schema.Turn
import java.sql.Timestamp

/** The golden-small fixture input (FIXTURES.md section 3): ~20 synthetic
  * conversations covering every payload kind, plus hand-written edge-case
  * turns. Pure data — the committed goldens in
  * src/test/resources/golden/golden_small.jsonl are the frozen expected
  * extraction of exactly these turns (regenerate with
  * `sbt "Test/runMain graft.MakeGoldens"` ONLY on a deliberate spec bump,
  * then review the diff).
  */
object GoldenData {

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  /** Hand-written edge cases (FIXTURES.md section 3 list). */
  val edgeTurns: Seq[Turn] = Seq(
    // empty + whitespace-only
    Turn("edge-empty", 0, "user", "", "", ts(0)),
    Turn("edge-empty", 1, "user", "   \n\t  ", "", ts(1)),
    // boilerplate-only html -> extracted_text == "", spans == []
    Turn("edge-boiler", 0, "assistant",
      "<html><body><nav><a href='/'>Home</a> <a href='/x'>X</a></nav>" +
        "<footer><a href='/t'>tos</a></footer></body></html>", "", ts(2)),
    // malformed html: unclosed + mismatched tags
    Turn("edge-malformed", 0, "assistant",
      "<div><p>alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma</b></span>", "", ts(3)),
    // entity at payload boundary + truncated entity
    Turn("edge-entity", 0, "assistant",
      "<p>one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen seventeen &amp;</p>", "", ts(4)),
    Turn("edge-entity", 1, "assistant",
      "<p>one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen seventeen &am", "", ts(5)),
    // tag bomb -> bounded-work fallback, error column set
    Turn("edge-bomb", 0, "assistant", "<p>" + ("<b>" * 300000), "", ts(6)),
    // CJK + fullwidth normalization
    Turn("edge-cjk", 0, "user",
      "数据 分析　ＡＢＣ！ plus ascii words here to make it long enough",
      "", ts(7)),
    // pdf runs emitted in shuffled order
    Turn("edge-pdf", 0, "user",
      """[{"page":0,"x0":0,"y0":20,"x1":30,"y1":30,"text":"second"},""" +
        """{"page":0,"x0":0,"y0":0,"x1":30,"y1":10,"text":"first"},""" +
        """{"page":0,"x0":33,"y0":0,"x1":60,"y1":10,"text":"line"}]""",
      "", ts(8)),
    // malformed pdf runs -> fallback
    Turn("edge-pdf", 1, "user",
      """[{"page":0,"x0":0,"text":"no coords"}]""", "", ts(9)),
    // tool with zero main-content spans
    Turn("edge-tool", 0, "tool", "$ true\nexit_code: 0", "bash", ts(10)),
    // tool search with escapes in snippet
    Turn("edge-tool", 1, "tool",
      """{"results":[{"title":"A \"quoted\" title","url":"u",""" +
        """"snippet":"line\nbreak snippet"}]}""", "search", ts(11)),
    // duplicate (conv_id, turn_idx): later ts wins
    Turn("edge-dup", 0, "user", "stale version of the turn", "", ts(12)),
    Turn("edge-dup", 0, "user", "fresh version of the turn", "", ts(99)),
    // ENT-2 classes: currency/typography, greek+math+arrows, legacy
    // semicolon-less forms, multi-codepoint, numeric C1 override
    Turn("edge-ent2", 0, "assistant",
      "<p>price one hundred &euro; or eighty &pound; maybe &yen; plus " +
        "a &sect; mark and a &dagger; note and a &permil; rate</p>", "",
      ts(14)),
    Turn("edge-ent2", 1, "assistant",
      "<p>math says &alpha; plus &beta; &ne; &gamma; for &forall; " +
        "values and the limit goes &rarr; &infin; with &part; small</p>",
      "", ts(15)),
    Turn("edge-ent2", 2, "assistant",
      "<p>legacy forms also decode one two three four five six seven " +
        "eight nine ten eleven twelve &amp thirteen &copy 2024 &eacutex" +
        "</p>", "", ts(16)),
    Turn("edge-ent2", 3, "assistant",
      "<p>combining form &NotEqualTilde; and numeric forms &#8364; " +
        "&#x2260; with c1 override &#146;&#153; and bare &#65 end plus " +
        "padding words to pass the content rule here</p>", "", ts(17)),
    // plain with messy paragraph whitespace
    Turn("edge-plain", 0, "user",
      "  lead ws\nsecond line  \n\n\n  par two  \n\t\n par three", "",
      ts(13)),
    // MD-1: headings at several levels, items, emphasis fragments
    Turn("edge-md", 0, "user",
      "# Title words here\n\nplain para line\n## Sub *head*\n" +
        "- item one\n- *two* starred\n###### deep\n####### toodeep x",
      "", ts(18)),
    // MD-1: code fence verbatim (markers kept inside), unterminated
    // fence runs to EOF
    Turn("edge-md", 1, "user",
      "# Code sample\n\n```\nkeep *stars* and # hashes - here\n\n" +
        "second code line\n```\nafter fence\n```\nunterminated tail",
      "", ts(19)),
    // MD-1: non-markers ('#tag', '-dash', '*' runs), all-asterisk line
    Turn("edge-md", 2, "user",
      "# Markers or not\n\n#tag stays\n-dash stays\n2 * 3 stars " +
        "stripped\n***\n- \nmixed *a*b*c* ends", "", ts(20)),
    // looksMd NEGATIVE: heading-like start but no second marker ->
    // stays on the plain path ('#' preserved)
    Turn("edge-md", 3, "user",
      "# looks like a heading\nbut no list or fence follows anywhere",
      "", ts(21)))

  /** Full golden-small input: 20 synthetic convs + edges. */
  def inputTurns: Seq[Turn] =
    (0L until 20L).flatMap(c =>
      SynthTranscripts.genConv(42L, c, megaEvery = 0, megaTurns = 0)) ++
      edgeTurns

  /** Skew fixture: 3 convs with 1 / 100 / 10000 turns (golden-skew). */
  def skewTurns: Seq[Turn] =
    SynthTranscripts.genConv(7L, 1L, 0, 0).take(1) ++
      (0 until 100).map(t => SynthTranscripts.makeTurn(7L, 2L, t)) ++
      (0 until 10000).map(t => SynthTranscripts.makeTurn(7L, 3L, t))
}
