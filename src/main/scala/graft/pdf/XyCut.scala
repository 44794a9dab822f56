package graft.pdf

import graft.schema.Span

/** Frozen PDF-layout spec XYCUT-1.
  *
  * Payload: a JSON array of text runs
  * `{"page":int, "x0","y0","x1","y1":float, "text":string}` possibly
  * emitted OUT of reading order. We reconstruct reading order with
  * recursive XY-cut over whitespace valleys — the forward version of the
  * reference's priority-queue segment packing that *generates* layouts
  * (vkit/pipeline/text_detection/page_layout.py:400-497): where the
  * reference recursively splits vertical segments to place lines, we
  * recursively split on projection gaps to recover the line order.
  *
  * Coordinates: x grows right, y grows DOWN (y0 = top). Reading order =
  * pages ascending; within a page recursive cuts — horizontal cut (split
  * on the widest y-gap) preferred over vertical (x-gap), both requiring
  * gap >= MinGap; leaves sorted by (y0, x0, input order). A final
  * line-grouping pass joins runs whose vertical overlap is >= 0.5 of the
  * smaller height into one block (words of a line -> one output line).
  */
object XyCut {

  /** Minimum projection gap (in payload units) that allows a cut.
    * Asymmetric on purpose: line gaps (y) are small, while a real column
    * gutter (x) is much wider than inter-word spacing — without the
    * higher x threshold, word gaps would trigger spurious vertical cuts
    * and reading order would go column-major inside a text line.
    */
  val MinGapY = 1.0
  val MinGapX = 8.0

  /** Max horizontal gap between consecutive runs still on one line; a
    * wider gap (e.g. a column gutter the cut could not separate because a
    * full-width header bridges the x-projection) starts a new block.
    */
  val MaxJoinGap = 5.0

  final case class Run(page: Int, x0: Double, y0: Double, x1: Double,
      y1: Double, srcBegin: Int, srcEnd: Int, order: Int) {
    def height: Double = y1 - y0
  }

  final class PdfParseError(msg: String) extends Exception(msg)

  /** Parse the runs payload, keeping source offsets of each text value.
    *
    * Specialized single-pass scanner (no AST, no boxing): Probe5 showed
    * the generic Json.parse AST accounted for ~half the pdf extractor's
    * per-byte cost. Semantics match the generic parser on valid
    * payloads — unknown fields of any JSON type are skipped
    * structurally, duplicate keys keep the first occurrence, numbers
    * parse to the same correctly-rounded doubles (integer mantissa +
    * exact power-of-ten division on the common form, Double.parseDouble
    * fallback for exponents) — and field-presence errors use the same
    * messages ("run N: missing K").
    */
  def parseRuns(payload: String): Vector[Run] =
    new RunsParser(payload).parseAll()

  private val Pow10: Array[Double] = Array.tabulate(19)(i =>
    math.pow(10.0, i)) // 10^0..10^18 are all exact doubles

  private final class RunsParser(s: String) {
    private[this] var pos = 0
    private[this] val n = s.length
    // last string scanned: content offsets between the quotes
    private[this] var strBegin = 0
    private[this] var strEnd = 0

    private def err(msg: String): Nothing =
      throw new PdfParseError(msg + " at " + pos)

    private def skipWs(): Unit = {
      while (pos < n) {
        val c = s.charAt(pos)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else return
      }
    }

    /** Scan a string literal; offsets land in strBegin/strEnd. */
    private def scanString(): Unit = {
      if (pos >= n || s.charAt(pos) != '"') err("expected string")
      pos += 1
      strBegin = pos
      while (pos < n) {
        val c = s.charAt(pos)
        if (c == '"') { strEnd = pos; pos += 1; return }
        else if (c == '\\') pos += 2
        else pos += 1
      }
      err("eof in string")
    }

    private def skipLit(word: String): Unit = {
      if (!s.startsWith(word, pos)) err("bad literal")
      pos += word.length
    }

    /** Structurally skip any JSON value (unknown/extra fields). */
    private def skipValue(depth: Int): Unit = {
      if (depth > 64) err("too deep")
      skipWs()
      if (pos >= n) err("eof")
      s.charAt(pos) match {
        case '{' =>
          pos += 1; skipWs()
          if (pos < n && s.charAt(pos) == '}') { pos += 1; return }
          while (true) {
            skipWs(); scanString(); skipWs()
            if (pos >= n || s.charAt(pos) != ':') err("expected :")
            pos += 1
            skipValue(depth + 1); skipWs()
            if (pos >= n) err("eof in object")
            val c = s.charAt(pos); pos += 1
            if (c == '}') return
            if (c != ',') err("expected , or }")
          }
        case '[' =>
          pos += 1; skipWs()
          if (pos < n && s.charAt(pos) == ']') { pos += 1; return }
          while (true) {
            skipValue(depth + 1); skipWs()
            if (pos >= n) err("eof in array")
            val c = s.charAt(pos); pos += 1
            if (c == ']') return
            if (c != ',') err("expected , or ]")
          }
        case '"' => scanString()
        case 't' => skipLit("true")
        case 'f' => skipLit("false")
        case 'n' => skipLit("null")
        case _   => parseNum()
      }
    }

    private def parseNum(): Double = {
      val start = pos
      var neg = false
      if (pos < n && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) {
        neg = s.charAt(pos) == '-'; pos += 1
      }
      var mant = 0L
      var digits = 0
      var frac = 0
      var seenDot = false
      var simple = true
      var done = false
      while (!done && pos < n) {
        val c = s.charAt(pos)
        if (c >= '0' && c <= '9') {
          if (digits < 18) {
            mant = mant * 10 + (c - '0'); digits += 1
            if (seenDot) frac += 1
          } else simple = false
          pos += 1
        } else if (c == '.' && !seenDot) { seenDot = true; pos += 1 }
        else if (c == '.' || c == 'e' || c == 'E' || c == '-' ||
          c == '+') { simple = false; pos += 1 }
        else done = true
      }
      if (pos == start) err("bad number")
      if (simple && digits > 0) {
        val v = mant / Pow10(frac)
        if (neg) -v else v
      } else {
        try java.lang.Double.parseDouble(s.substring(start, pos))
        catch { case _: NumberFormatException => err("bad number") }
      }
    }

    /** One run object; `idx` only feeds error messages. */
    private def parseRun(idx: Int): Run = {
      skipWs()
      if (pos >= n || s.charAt(pos) != '{')
        throw new PdfParseError("non-object run")
      pos += 1
      var page, x0, y0, x1, y1 = 0.0
      var fPage, fX0, fY0, fX1, fY1, fText = false
      var tb, te = 0
      skipWs()
      var done = pos < n && s.charAt(pos) == '}'
      if (done) pos += 1
      while (!done) {
        skipWs(); scanString()
        val kb = strBegin; val ke = strEnd
        skipWs()
        if (pos >= n || s.charAt(pos) != ':') err("expected :")
        pos += 1
        skipWs()
        val klen = ke - kb
        @inline def key(k: String): Boolean =
          klen == k.length && s.regionMatches(kb, k, 0, klen)
        val isNumStart = pos < n && {
          val c = s.charAt(pos)
          c != '{' && c != '[' && c != '"' && c != 't' && c != 'f' &&
            c != 'n'
        }
        if (key("text")) {
          if (pos < n && s.charAt(pos) == '"') {
            scanString()
            if (!fText) { tb = strBegin; te = strEnd; fText = true }
          } else skipValue(0)
        } else if (key("page") && isNumStart) {
          val v = parseNum(); if (!fPage) { page = v; fPage = true }
        } else if (key("x0") && isNumStart) {
          val v = parseNum(); if (!fX0) { x0 = v; fX0 = true }
        } else if (key("y0") && isNumStart) {
          val v = parseNum(); if (!fY0) { y0 = v; fY0 = true }
        } else if (key("x1") && isNumStart) {
          val v = parseNum(); if (!fX1) { x1 = v; fX1 = true }
        } else if (key("y1") && isNumStart) {
          val v = parseNum(); if (!fY1) { y1 = v; fY1 = true }
        } else skipValue(0)
        skipWs()
        if (pos >= n) err("eof in object")
        val c = s.charAt(pos); pos += 1
        if (c == '}') done = true
        else if (c != ',') err("expected , or }")
      }
      // same check order (and messages) as the generic path
      if (!fText) throw new PdfParseError(s"run $idx: missing text")
      if (!fPage) throw new PdfParseError(s"run $idx: missing page")
      if (!fX0) throw new PdfParseError(s"run $idx: missing x0")
      if (!fY0) throw new PdfParseError(s"run $idx: missing y0")
      if (!fX1) throw new PdfParseError(s"run $idx: missing x1")
      if (!fY1) throw new PdfParseError(s"run $idx: missing y1")
      Run(page.toInt, x0, y0, x1, y1, tb, te, idx)
    }

    def parseAll(): Vector[Run] = {
      skipWs()
      if (pos >= n) err("eof")
      if (s.charAt(pos) != '[')
        throw new PdfParseError("payload is not a JSON array")
      pos += 1
      val out = Vector.newBuilder[Run]
      skipWs()
      if (pos < n && s.charAt(pos) == ']') pos += 1
      else {
        var idx = 0
        var done = false
        while (!done) {
          out += parseRun(idx)
          idx += 1
          skipWs()
          if (pos >= n) err("eof in array")
          val c = s.charAt(pos); pos += 1
          if (c == ']') done = true
          else if (c != ',') err("expected , or ]")
        }
      }
      skipWs()
      if (pos < n) err("trailing content")
      out.result()
    }
  }

  // comparators for the in-place array form of the cut (identical
  // orderings to the original sortBy keys; `order` is unique per run,
  // so the terminal sort is total and partition stability is moot)
  private val cmpX0: java.util.Comparator[Run] =
    (a: Run, b: Run) => java.lang.Double.compare(a.x0, b.x0)
  private val cmpTerminal: java.util.Comparator[Run] =
    (a: Run, b: Run) => {
      val c1 = java.lang.Double.compare(a.y0, b.y0)
      if (c1 != 0) c1
      else {
        val c2 = java.lang.Double.compare(a.x0, b.x0)
        if (c2 != 0) c2 else Integer.compare(a.order, b.order)
      }
    }

  /** Largest gap in the 1D projection of arr[lo,hi), which is ALREADY
    * sorted by its start coordinate (y0 for useY, x0 otherwise) — a
    * single linear sweep, no copy, no sort. Returns packed (cut, gap)
    * or null if the widest gap is below minGap. Equal-start tie order
    * cannot affect the sweep: a gap needs start > reach, and reach is
    * already >= every processed start.
    */
  private def sweepGap(arr: Array[Run], lo: Int, hi: Int,
      useY: Boolean, minGap: Double): Array[Double] = {
    val h0 = arr(lo)
    var reach = if (useY) h0.y1 else h0.x1
    var best = 0.0
    var bestAt = 0.0
    var i = lo + 1
    while (i < hi) {
      val r = arr(i)
      val s = if (useY) r.y0 else r.x0
      val e = if (useY) r.y1 else r.x1
      if (s > reach) {
        val gap = s - reach
        if (gap > best) { best = gap; bestAt = (reach + s) / 2 }
      }
      if (e > reach) reach = e
      i += 1
    }
    if (best >= minGap) Array(bestAt, best) else null
  }

  /** Stable in-place partition of arr[lo,hi) by pred via scratch;
    * returns the split point (pred-true rows first).
    */
  private def partitionSeg(arr: Array[Run], scratch: Array[Run],
      lo: Int, hi: Int, pred: Run => Boolean): Int = {
    var w = lo
    var s = 0
    var i = lo
    while (i < hi) {
      val r = arr(i)
      if (pred(r)) { arr(w) = r; w += 1 }
      else { scratch(s) = r; s += 1 }
      i += 1
    }
    System.arraycopy(scratch, 0, arr, w, s)
    w
  }

  /** The recursion works on TWO parallel views of the same segment:
    * `ys` sorted by (y0, x0, order) and `xs` sorted by x0. Both gap
    * sweeps are then linear (no per-level sort), a cut stable-partitions
    * both views (preserving each view's sort within the halves), and a
    * terminal segment of `ys` is ALREADY in the exact
    * (y0, x0, order) order the original sortBy produced — so terminals
    * are no-ops and `ys` accumulates the final reading order in place.
    */
  private def orderSeg(ys: Array[Run], xs: Array[Run],
      scratch: Array[Run], lo: Int, hi: Int, depth: Int): Unit = {
    if (hi - lo <= 1 || depth > 64) return
    val yGap = sweepGap(ys, lo, hi, useY = true, MinGapY)
    val xGap = sweepGap(xs, lo, hi, useY = false, MinGapX)
    if (yGap != null && (xGap == null || yGap(1) >= xGap(1))) {
      val cy = yGap(0)
      val mid = partitionSeg(ys, scratch, lo, hi, _.y1 <= cy)
      partitionSeg(xs, scratch, lo, hi, _.y1 <= cy)
      orderSeg(ys, xs, scratch, lo, mid, depth + 1)
      orderSeg(ys, xs, scratch, mid, hi, depth + 1)
    } else if (xGap != null) {
      val cx = xGap(0)
      val mid = partitionSeg(ys, scratch, lo, hi, _.x1 <= cx)
      partitionSeg(xs, scratch, lo, hi, _.x1 <= cx)
      orderSeg(ys, xs, scratch, lo, mid, depth + 1)
      orderSeg(ys, xs, scratch, mid, hi, depth + 1)
    }
  }

  /** Recursive XY-cut on one page's runs; returns reading order.
    * Two sorts total (not two per recursion level) and zero
    * allocations in the recursion: the original per-level tuple-Seq
    * builds, sortBys and Vector partitions dominated pdf extraction
    * cost (Probe5: xy-cut was ~80% of span time at 62 MB/s/core).
    */
  def orderPage(runs: Vector[Run], depth: Int = 0): Vector[Run] = {
    if (runs.length <= 1) return runs
    val ys = runs.toArray
    java.util.Arrays.sort(ys, cmpTerminal)
    val xs = ys.clone()
    java.util.Arrays.sort(xs, cmpX0)
    val scratch = new Array[Run](ys.length)
    orderSeg(ys, xs, scratch, 0, ys.length, depth)
    ys.toVector
  }

  /** Group ordered runs into lines: consecutive runs whose vertical
    * overlap >= 0.5 * min(height) stay on one line (one block).
    */
  def lineBlocks(ordered: Vector[Run]): Vector[Vector[Run]] = {
    val out = Vector.newBuilder[Vector[Run]]
    var cur = Vector.newBuilder[Run]
    var last: Run = null
    for (r <- ordered) {
      if (last == null) cur += r
      else {
        val overlap = math.min(last.y1, r.y1) - math.max(last.y0, r.y0)
        val minH = math.min(last.height, r.height)
        val sameLine = r.page == last.page &&
          overlap >= 0.5 * math.max(minH, 1e-9) &&
          r.x0 - last.x1 <= MaxJoinGap
        if (sameLine) cur += r
        else { out += cur.result(); cur = Vector.newBuilder[Run]; cur += r }
      }
      last = r
    }
    val tail = cur.result()
    if (tail.nonEmpty) out += tail
    out.result()
  }

  /** Full extraction: payload -> content spans (into the raw JSON source;
    * each line of runs is one block, runs are cont spans joined by ' ' at
    * render, per RENDER-1 pdf joiner).
    */
  def extractSpans(payload: String): Vector[Span] = {
    val runs = parseRuns(payload)
    if (runs.isEmpty) return Vector.empty
    val ordered = runs.groupBy(_.page).toVector.sortBy(_._1)
      .flatMap { case (_, rs) => orderPage(rs) }
    lineBlocks(ordered.toVector).flatMap { line =>
      line.zipWithIndex.map { case (r, i) =>
        Span(r.srcBegin, r.srcEnd, if (i == 0) "block" else "cont")
      }
    }
  }
}
