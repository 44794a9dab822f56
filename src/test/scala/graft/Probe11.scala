package graft

import graft.synth.SynthTranscripts

/** Where does html extraction time go? tokenizer vs DOM vs boilerplate
  * vs full pipeline (incl. render).
  */
object Probe11 {
  def main(args: Array[String]): Unit = {
    val r = new SynthTranscripts.Rng(42)
    val payloads = Vector.fill(2000)(SynthTranscripts.htmlPayload(r))
    def bench(label: String)(f: String => Any): Unit = {
      payloads.foreach(f)
      val t0 = System.nanoTime()
      var reps = 0
      while (System.nanoTime() - t0 < 1.5e9) { payloads.foreach(f); reps += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      val bytes = payloads.map(_.length.toLong).sum * reps
      println(f"[p11] $label%-12s ${bytes / dt / 1e6}%8.1f MB/s/core")
    }
    val limits = graft.html.Dom.Limits()
    bench("tokenize") { p =>
      graft.html.HtmlTokenizer.tokenize(p).length
    }
    bench("dom") { p => graft.html.Dom.parse(p, limits) }
    bench("boiler") { p => graft.html.Boilerplate.extract(p, limits) }
    bench("segment") { p =>
      graft.html.StreamSegmenter.segment(p, limits)
    }
    bench("scan-only") { p =>
      graft.html.HtmlTokenizer.scan(p, keepAttrs = false)(_ => ())
    }
    bench("decode") { p =>
      val sb = new java.lang.StringBuilder(p.length)
      graft.text.Entities.decodeAppend(sb, p, 0, p.length)
    }
    bench("wsCollapse") { p => graft.text.Normalizer.wsCollapse(p) }
    bench("full") { p =>
      graft.extract.Extractor.extract("assistant", "", p)
    }
  }
}
