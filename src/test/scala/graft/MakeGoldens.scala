package graft

import graft.extract.Extractor
import graft.schema.{Extraction, Span, Turn}
import graft.synth.GoldenData
import java.nio.file.{Files, Paths}

/** Regenerates src/test/resources/golden/golden_small.jsonl from the
  * frozen GoldenData input via the extractor spec. Run ONLY on a
  * deliberate spec version bump and review the diff:
  *   sbt "Test/runMain graft.MakeGoldens"
  */
object MakeGoldens {

  def esc(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def goldenLine(t: Turn, ex: Extraction): String = {
    val spans = ex.spans.map(s =>
      s"""{"begin":${s.begin},"end":${s.end},"kind":${esc(s.kind)}}""")
      .mkString("[", ",", "]")
    s"""{"conv_id":${esc(t.conv_id)},"turn_idx":${t.turn_idx},""" +
      s""""role":${esc(t.role)},"tool":${esc(t.tool)},""" +
      s""""extractor":${esc(ex.extractor)},""" +
      s""""extracted_text":${esc(ex.extracted_text)},""" +
      s""""spans":$spans,"error":${esc(ex.error)},""" +
      s""""extractor_version":${esc(ex.extractor_version)}}"""
  }

  /** Dedupe rule mirrored from Job.dedupe: keep max (ts, len, text). */
  def dedupe(turns: Seq[Turn]): Seq[Turn] =
    turns.groupBy(t => (t.conv_id, t.turn_idx)).values.map(_.maxBy(t =>
      (t.ts.getTime, t.text.length, t.text))).toSeq
      .sortBy(t => (t.conv_id, t.turn_idx))

  def main(args: Array[String]): Unit = {
    val out = dedupe(GoldenData.inputTurns)
      .map(t => goldenLine(t, Extractor.extract(t)))
    val dir = Paths.get("src/test/resources/golden")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("golden_small.jsonl"),
      out.mkString("", "\n", "\n"))
    println(s"wrote ${out.size} golden rows")
  }
}
