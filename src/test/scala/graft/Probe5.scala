package graft

import graft.synth.SynthTranscripts

/** Where does pdf extraction time go? parser vs xy-cut vs render. */
object Probe5 {
  def main(args: Array[String]): Unit = {
    val r = new SynthTranscripts.Rng(42)
    val payloads = Vector.fill(3000)(SynthTranscripts.pdfPayload(r))
    def bench(label: String)(f: String => Any): Unit = {
      payloads.foreach(f) // warmup
      val t0 = System.nanoTime()
      var reps = 0
      while (System.nanoTime() - t0 < 1.5e9) { payloads.foreach(f); reps += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      val bytes = payloads.map(_.length.toLong).sum * reps
      println(f"[p5] $label%-12s ${bytes / dt / 1e6}%8.1f MB/s/core")
    }
    bench("parse")(graft.pdf.XyCut.parseRuns)
    bench("spans")(graft.pdf.XyCut.extractSpans)
    bench("full") { p =>
      graft.extract.Extractor.extract("user", "", p)
    }
  }
}
