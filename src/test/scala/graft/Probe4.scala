package graft

import graft.extract.Extractor
import graft.synth.SynthTranscripts

/** Per-payload-kind extraction microprofile (no Spark).
  *   sbt "Test/runMain graft.Probe4"
  */
object Probe4 {
  def main(args: Array[String]): Unit = {
    val kinds = Seq("plain", "html", "pdf", "md", "tool")
    val r = new SynthTranscripts.Rng(42)
    def payload(kind: String): (String, String, String) = kind match {
      case "plain" => ("user", "", SynthTranscripts.plainPayload(r))
      case "html"  => ("assistant", "", SynthTranscripts.htmlPayload(r))
      case "pdf"   => ("assistant", "", SynthTranscripts.pdfPayload(r))
      case "md" => ("user", "",
        "# Section heading\n\n" + SynthTranscripts.plainPayload(r) +
          "\n- item *one* listed\n- second *item*\n\n" +
          "```\ncode *stays* verbatim # here\n```\n")
      case _       => ("tool", "bash",
        SynthTranscripts.toolPayload(r, "bash"))
    }
    for (kind <- kinds) {
      val samples = Vector.fill(2000)(payload(kind))
      // warmup
      samples.foreach { case (ro, to, t) => Extractor.extract(ro, to, t) }
      val t0 = System.nanoTime()
      var reps = 0
      while (System.nanoTime() - t0 < 2e9) {
        samples.foreach { case (ro, to, t) =>
          Extractor.extract(ro, to, t)
        }
        reps += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val n = reps * samples.size
      val bytes = samples.map(_._3.length.toLong).sum * reps
      println(f"[p4] $kind%-6s ${n / dt}%10.0f turns/s/core  " +
        f"${bytes / dt / 1e6}%8.1f MB/s/core  " +
        f"avg ${samples.map(_._3.length).sum / samples.size}%6d chars")
    }
  }
}
