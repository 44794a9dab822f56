package graft

import graft.text.{Entities, Normalizer}

/** In-JVM A/B: ENT-2 decodeAppend vs the ENT-1 implementation (inlined
  * below) on the same synthetic html text-node mix — isolates the entity
  * decoder from box noise.  sbt "Test/runMain graft.Probe6"
  */
object Probe6 {

  // --- ENT-1 reference implementation (34-name Map, ';' required) ---
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "laquo" -> "«",
    "raquo" -> "»", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "bull" -> "•",
    "middot" -> "·", "times" -> "×", "divide" -> "÷",
    "deg" -> "°", "plusmn" -> "±", "frac12" -> "½",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "ccedil" -> "ç", "uuml" -> "ü", "ouml" -> "ö",
    "auml" -> "ä", "szlig" -> "ß", "ntilde" -> "ñ")
  private val maxNameLen = named.keys.map(_.length).max

  private def decodeBody(body: String): String = {
    if (body.isEmpty) null
    else if (body.charAt(0) == '#') {
      val num = body.substring(1)
      try {
        val cp =
          if (num.nonEmpty &&
            (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
            Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num, 10)
        if (cp <= 0 || cp > 0x10FFFF ||
          (cp >= 0xD800 && cp <= 0xDFFF)) null
        else new String(Character.toChars(cp))
      } catch { case _: NumberFormatException => null }
    } else named.getOrElse(body, null)
  }

  def oldDecodeAppend(sb: java.lang.StringBuilder, s: String, from: Int,
      until: Int): Boolean = {
    var nonBlank = false
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (c != '&') {
        sb.append(c)
        if (!Normalizer.isWs(c)) nonBlank = true
        i += 1
      } else {
        val semi = s.indexOf(';', i + 1)
        val limit = i + 2 + math.max(maxNameLen, 8)
        val decoded =
          if (semi < 0 || semi >= until || semi > limit) null
          else decodeBody(s.substring(i + 1, semi))
        if (decoded == null) { sb.append('&'); nonBlank = true; i += 1 }
        else {
          sb.append(decoded)
          if (!Normalizer.isBlank(decoded)) nonBlank = true
          i = semi + 1
        }
      }
    }
    nonBlank
  }

  def main(args: Array[String]): Unit = {
    val r = new graft.synth.SynthTranscripts.Rng(42)
    // text-node-sized samples, ~1/3 with an entity (the synth mix)
    val samples = Vector.fill(3000) {
      val base = graft.synth.SynthTranscripts.plainPayload(r)
      base.take(200 + r.nextInt(400))
    }
    def bench(name: String)(
        f: (java.lang.StringBuilder, String, Int, Int) => Boolean)
        : Unit = {
      var best = Long.MaxValue
      var chars = 0L
      for (_ <- 0 until 5) {
        val sb = new java.lang.StringBuilder(1 << 16)
        val t0 = System.nanoTime()
        var reps = 0
        while (System.nanoTime() - t0 < 1e9) {
          samples.foreach { s =>
            sb.setLength(0); f(sb, s, 0, s.length)
          }
          reps += 1
        }
        val dt = System.nanoTime() - t0
        chars = samples.map(_.length.toLong).sum * reps
        val perChar = dt.toDouble / chars
        if (dt / reps < best) best = dt / reps
        println(f"[p6] $name%-6s ${chars * 1000.0 / dt}%.1f Mchar/s")
      }
    }
    bench("old")(oldDecodeAppend)
    bench("new")(Entities.decodeAppend)
    bench("old")(oldDecodeAppend)
    bench("new")(Entities.decodeAppend)
  }
}
