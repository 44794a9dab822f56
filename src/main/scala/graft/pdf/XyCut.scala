package graft.pdf

import graft.schema.Span
import graft.text.Json
import graft.text.Json._

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
      y1: Double, text: String, srcBegin: Int, srcEnd: Int, order: Int) {
    def height: Double = y1 - y0
  }

  final class PdfParseError(msg: String) extends Exception(msg)

  /** Parse the runs payload, keeping source offsets of each text value. */
  def parseRuns(payload: String): Vector[Run] = {
    val j =
      try Json.parse(payload)
      catch { case e: Exception => throw new PdfParseError(e.getMessage) }
    j match {
      case JArr(items) =>
        items.zipWithIndex.map {
          case (JObj(f), idx) =>
            val o = JObj(f)
            def num(k: String): Double = o.get(k) match {
              case Some(JNum(v)) => v
              case _ => throw new PdfParseError(s"run $idx: missing $k")
            }
            o.get("text") match {
              case Some(JStr(v, b, e)) =>
                Run(num("page").toInt, num("x0"), num("y0"), num("x1"),
                  num("y1"), v, b, e, idx)
              case _ => throw new PdfParseError(s"run $idx: missing text")
            }
          case _ => throw new PdfParseError("non-object run")
        }
      case _ => throw new PdfParseError("payload is not a JSON array")
    }
  }

  /** Largest gap in the 1D projection of intervals; None if < MinGap.
    * Returns the cut coordinate (middle of the widest gap).
    */
  private def widestGap(iv: Seq[(Double, Double)],
      minGap: Double): Option[(Double, Double)] = {
    val sortedIv = iv.sortBy(_._1)
    var reach = sortedIv.head._2
    var best = 0.0
    var bestAt = 0.0
    for ((lo, hi) <- sortedIv.tail) {
      if (lo > reach) {
        val gap = lo - reach
        if (gap > best) { best = gap; bestAt = (reach + lo) / 2 }
      }
      reach = math.max(reach, hi)
    }
    if (best >= minGap) Some((bestAt, best)) else None
  }

  /** Recursive XY-cut on one page's runs; returns reading order. */
  def orderPage(runs: Vector[Run], depth: Int = 0): Vector[Run] = {
    if (runs.length <= 1 || depth > 64)
      return runs.sortBy(r => (r.y0, r.x0, r.order))
    val yGap = widestGap(runs.map(r => (r.y0, r.y1)), MinGapY)
    val xGap = widestGap(runs.map(r => (r.x0, r.x1)), MinGapX)
    (yGap, xGap) match {
      case (Some((cy, gy)), Some((cx, gx))) if gy >= gx =>
        val (top, bot) = runs.partition(_.y1 <= cy)
        orderPage(top, depth + 1) ++ orderPage(bot, depth + 1)
      case (_, Some((cx, _))) =>
        val (left, right) = runs.partition(_.x1 <= cx)
        orderPage(left, depth + 1) ++ orderPage(right, depth + 1)
      case (Some((cy, _)), None) =>
        val (top, bot) = runs.partition(_.y1 <= cy)
        orderPage(top, depth + 1) ++ orderPage(bot, depth + 1)
      case (None, None) =>
        runs.sortBy(r => (r.y0, r.x0, r.order))
    }
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
