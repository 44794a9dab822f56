package graft.synth

import graft.schema.Turn
import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp

/** Deterministic synthetic transcript generator (seed=42 default).
  *
  * Determinism contract (the reference's SeedSequence-spawn pattern,
  * vkit/utility/pool.py:86-96): every turn's payload is a pure function of
  * (seed, convIdx, turnIdx) via a SplitMix64 stream — any subset of rows is
  * reproducible independently of partitioning, task retries, or cluster
  * size. No wall-clock anywhere.
  *
  * Payload mix mirrors the reference's weighted engine ensembles
  * (vkit/engine/interface.py:188-215): ~40% plain, ~35% HTML, ~10%
  * PDF-like runs JSON, ~15% tool output. Every `megaEvery`-th conversation
  * is a mega-conversation (skew fixture for AQE/salting).
  */
object SynthTranscripts {

  /** SplitMix64 PRNG — tiny, fast, deterministic. */
  final class Rng(seed0: Long) {
    private var x = seed0
    def nextLong(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextInt(n: Int): Int = {
      val v = nextLong() >>> 1
      (v % n).toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))
  }

  def mix(parts: Long*): Long = {
    var h = 0xCBF29CE484222325L
    for (p <- parts) {
      h ^= p
      h *= 0x100000001B3L
    }
    h
  }

  private val words: IndexedSeq[String] = Vector(
    "data", "spark", "query", "table", "join", "merge", "filter", "scan",
    "window", "batch", "stream", "shuffle", "partition", "column", "row",
    "vector", "hash", "sort", "group", "order", "key", "value", "line",
    "text", "span", "block", "node", "token", "parse", "extract",
    "pipeline", "engine", "turn", "agent", "model", "result", "answer",
    "context", "system", "distributed", "throughput", "latency",
    "analysis", "document", "content", "layout", "reading", "order")

  private val cjk: IndexedSeq[String] =
    Vector("数据", "查询", "分析", "文本", "内容", "提取")

  private val entities: IndexedSeq[String] =
    Vector("&amp;", "&lt;", "&gt;", "&#x27;", "&#8212;", "&quot;",
      "&nbsp;", "&hellip;")

  def sentence(r: Rng, min: Int = 5, max: Int = 12): String = {
    val n = min + r.nextInt(max - min + 1)
    (0 until n).map(_ => r.pick(words)).mkString(" ")
  }

  def paragraph(r: Rng): String =
    (0 until 2 + r.nextInt(3)).map(_ => sentence(r)).mkString(". ") + "."

  // ---- payload generators --------------------------------------------

  def plainPayload(r: Rng): String = {
    val pars = (0 until 1 + r.nextInt(3)).map(_ => paragraph(r))
    val sep = if (r.nextInt(4) == 0) "\n\n\n" else "\n\n"
    val lead = if (r.nextInt(5) == 0) "  \n" else ""
    lead + pars.mkString(sep)
  }

  def htmlPayload(r: Rng): String = {
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html><html><head><title>"
    sb ++= sentence(r, 2, 4)
    sb ++= "</title><script>var x = 1 < 2;</script>"
    sb ++= "<style>p { margin: 0 }</style></head><body>"
    sb ++= "<nav>"
    for (i <- 0 until 3 + r.nextInt(4))
      sb ++= s"""<a href="/p$i">${r.pick(words)} ${r.pick(words)}</a> """
    sb ++= "</nav>"
    if (r.nextInt(3) == 0) sb ++= "<!-- comment <p>ignored</p> -->"
    val nPars = 1 + r.nextInt(4)
    for (_ <- 0 until nPars) {
      val tag = r.pick(Vector("p", "p", "p", "div", "blockquote"))
      sb ++= s"<$tag>"
      var par = paragraph(r) + " " + paragraph(r)
      if (r.nextInt(3) == 0) par = par + " " + r.pick(entities) + " " +
        sentence(r)
      if (r.nextInt(5) == 0) par = par + " " + r.pick(cjk) + "　" +
        r.pick(cjk)
      if (r.nextInt(4) == 0) {
        // inline markup
        par = par + " <b>" + r.pick(words) + "</b> " + sentence(r)
      }
      sb ++= par
      if (r.nextInt(6) != 0) sb ++= s"</$tag>" // sometimes unclosed
    }
    if (r.nextInt(2) == 0) {
      sb ++= "<ul>"
      for (_ <- 0 until 2 + r.nextInt(3))
        sb ++= s"<li>${sentence(r, 8, 14)} ${sentence(r, 10, 14)}</li>"
      sb ++= "</ul>"
    }
    sb ++= s"<footer><a href='/tos'>terms</a> <a href='/pp'>privacy</a> " +
      s"${r.pick(words)}</footer></body></html>"
    sb.toString
  }

  /** Out-of-order runs JSON the XY-cut must reorder. */
  def pdfPayload(r: Rng): String = {
    val twoCol = r.nextInt(3) == 0
    val lines = 2 + r.nextInt(5)
    case class R(page: Int, x0: Double, y0: Double, x1: Double, y1: Double,
        text: String)
    val runs = scala.collection.mutable.ArrayBuffer[R]()
    var y = 0.0
    for (li <- 0 until lines) {
      val ws = (0 until 3 + r.nextInt(5)).map(_ => r.pick(words))
      val colX = if (twoCol && li >= lines / 2) 200.0 else 0.0
      val yy = if (twoCol && li >= lines / 2) (li - lines / 2) * 14.0
        else li * 14.0
      var x = colX
      for (w <- ws) {
        val w1 = x + w.length * 6.0
        runs += R(0, x, yy, w1, yy + 10.0, w)
        x = w1 + 3.0
      }
      y += 14.0
    }
    // deterministic shuffle (Fisher-Yates with our rng)
    val arr = runs.toArray
    var i = arr.length - 1
    while (i > 0) {
      val j = r.nextInt(i + 1)
      val t = arr(i); arr(i) = arr(j); arr(j) = t
      i -= 1
    }
    arr.map(x =>
      s"""{"page":${x.page},"x0":${x.x0},"y0":${x.y0},""" +
        s""""x1":${x.x1},"y1":${x.y1},"text":"${x.text}"}""")
      .mkString("[", ",", "]")
  }

  def toolPayload(r: Rng, tool: String): String = tool match {
    case "bash" =>
      val cmd = "$ " + r.pick(Vector("ls -la", "grep -r x .", "cat f.txt",
        "wc -l data.csv"))
      val out = (0 until 1 + r.nextInt(4)).map(_ => sentence(r, 3, 7))
      (Seq(cmd) ++ out ++ Seq("exit_code: 0")).mkString("\n")
    case "python" =>
      val expr = ">>> " + r.pick(Vector("1+1", "len(xs)", "df.count()"))
      val out = (0 until 1 + r.nextInt(3)).map(_ => sentence(r, 2, 6))
      (Seq(expr) ++ out).mkString("\n")
    case _ => // search
      val results = (0 until 1 + r.nextInt(3)).map { i =>
        s"""{"title":"${sentence(r, 2, 4)}","url":"https://ex.com/$i",""" +
          s""""snippet":"${sentence(r, 6, 12)}"}"""
      }
      s"""{"results":[${results.mkString(",")}]}"""
  }

  // ---- turn/conversation assembly ------------------------------------

  val toolNames: IndexedSeq[String] = Vector("bash", "search", "python")

  def turnsPerConv(seed: Long, convIdx: Long, megaEvery: Int,
      megaTurns: Int): Int = {
    val r = new Rng(mix(seed, convIdx, 0x7E7EL))
    if (megaEvery > 0 && convIdx % megaEvery == 0 && convIdx > 0) megaTurns
    else 4 + r.nextInt(36)
  }

  /** Build one turn — pure function of (seed, convIdx, turnIdx). */
  def makeTurn(seed: Long, convIdx: Long, turnIdx: Int): Turn = {
    val r = new Rng(mix(seed, convIdx, turnIdx.toLong))
    val convId = f"conv-$convIdx%08d"
    val kindRoll = r.nextDouble()
    val (role, tool, text) =
      if (kindRoll < 0.40)
        (if (turnIdx % 2 == 0) "user" else "assistant", "", plainPayload(r))
      else if (kindRoll < 0.75)
        ("assistant", "", htmlPayload(r))
      else if (kindRoll < 0.85)
        ("assistant", "", pdfPayload(r))
      else {
        val t = r.pick(toolNames)
        ("tool", t, toolPayload(r, t))
      }
    val ts = new Timestamp(1700000000000L + convIdx * 3600000L +
      turnIdx * 30000L)
    Turn(convId, turnIdx, role, text, tool, ts)
  }

  def genConv(seed: Long, convIdx: Long, megaEvery: Int,
      megaTurns: Int): Seq[Turn] = {
    val n = turnsPerConv(seed, convIdx, megaEvery, megaTurns)
    (0 until n).map(t => makeTurn(seed, convIdx, t))
  }

  /** Distributed generation: one task per conversation batch; rows are
    * seed-derived, so partitioning never changes content.
    */
  def turns(spark: SparkSession, numConvs: Long, seed: Long = 42L,
      megaEvery: Int = 500, megaTurns: Int = 4000,
      partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val base = spark.range(0, numConvs,
      1, if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism)
    base.flatMap(c => genConv(seed, c, megaEvery, megaTurns))
  }
}
