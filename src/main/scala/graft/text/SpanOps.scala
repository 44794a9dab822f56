package graft.text

import graft.schema.Span

/** 1D span-set algebra — the reference's element set ops
  * (vkit/element/type.py:36-43 ElementSetOperationMode;
  * vkit/element/mask.py:125-244 rasterized union/distinct/intersect)
  * restated as sweep-line ops over half-open char intervals, plus the
  * box algebra (shift/clip/bounding fold, vkit/element/box.py:58-219).
  * All ops are pure, O(n log n) worst case, allocation-light.
  */
object SpanOps {

  /** Sort by (begin, end). */
  def sorted(spans: Seq[Span]): Seq[Span] =
    spans.sortBy(s => (s.begin, s.end))

  /** True iff sorted, pairwise disjoint, in [0, len], all non-negative
    * width — the invariant every extractor output must satisfy
    * (1D restatement of the geometric validity check,
    * vkit/pipeline/text_detection/page_text_region_label.py:226-233).
    */
  def invariantsHold(spans: Seq[Span], len: Int): Boolean = {
    var prevEnd = 0
    var i = 0
    while (i < spans.length) {
      val s = spans(i)
      if (s.begin < prevEnd || s.end < s.begin || s.end > len) return false
      prevEnd = s.end
      i += 1
    }
    true
  }

  /** Union of two span sets: merge overlapping/adjacent intervals.
    * Resulting spans carry kind "block".
    */
  def union(a: Seq[Span], b: Seq[Span]): Seq[Span] =
    mergeTouching(sorted(a ++ b))

  /** Merge overlapping or touching intervals in a sorted list. */
  def mergeTouching(s: Seq[Span]): Seq[Span] = {
    if (s.isEmpty) return s
    val out = scala.collection.mutable.ArrayBuffer[Span]()
    var cur = s.head
    for (x <- s.tail) {
      if (x.begin <= cur.end)
        cur = Span(cur.begin, math.max(cur.end, x.end), cur.kind)
      else { out += cur; cur = x }
    }
    out += cur
    out.toSeq
  }

  /** Unionize with provenance: merge overlapping/touching spans and
    * report, for every INPUT span, the index of the merged span that
    * absorbed it — the 1D form of the reference's unionize_polygons,
    * which returns merged polygons plus the source->merged assignment
    * by max overlap (vkit/element/polygon.py unionize + the argmax
    * mapping in page_text_region). In 1D every input is fully contained
    * in exactly one merged span, so max-overlap == containment.
    *
    * Returns (merged spans ascending, provenance) with
    * provenance(i) = merged index of input i (input order preserved).
    */
  def unionizeWithProvenance(spans: Seq[Span])
      : (Seq[Span], Seq[Int]) = {
    if (spans.isEmpty) return (Seq.empty, Seq.empty)
    val idx = spans.zipWithIndex.sortBy { case (s, i) => (s.begin, s.end, i) }
    val merged = scala.collection.mutable.ArrayBuffer[Span]()
    val prov = new Array[Int](spans.length)
    var cur = idx.head._1
    prov(idx.head._2) = 0
    for ((x, i) <- idx.tail) {
      if (x.begin <= cur.end)
        cur = Span(cur.begin, math.max(cur.end, x.end), cur.kind)
      else { merged += cur; cur = x }
      prov(i) = merged.length
    }
    merged += cur
    (merged.toSeq, prov.toSeq)
  }

  /** Intersection of two span sets (both need not be merged). */
  def intersect(a: Seq[Span], b: Seq[Span]): Seq[Span] = {
    val as = mergeTouching(sorted(a))
    val bs = mergeTouching(sorted(b))
    val out = scala.collection.mutable.ArrayBuffer[Span]()
    var i = 0; var j = 0
    while (i < as.length && j < bs.length) {
      val lo = math.max(as(i).begin, bs(j).begin)
      val hi = math.min(as(i).end, bs(j).end)
      if (lo < hi) out += Span(lo, hi, "block")
      if (as(i).end <= bs(j).end) i += 1 else j += 1
    }
    out.toSeq
  }

  /** a minus b (complement-style subtract; the reference's inverted-mask
    * drop, vkit/element/mask.py:445-447).
    */
  def subtract(a: Seq[Span], b: Seq[Span]): Seq[Span] = {
    val as = mergeTouching(sorted(a))
    val bs = mergeTouching(sorted(b))
    val out = scala.collection.mutable.ArrayBuffer[Span]()
    var j = 0
    for (s <- as) {
      var cur = s.begin
      while (j < bs.length && bs(j).end <= s.begin) j += 1
      var k = j
      while (k < bs.length && bs(k).begin < s.end) {
        if (bs(k).begin > cur) out += Span(cur, bs(k).begin, "block")
        cur = math.max(cur, bs(k).end)
        k += 1
      }
      if (cur < s.end) out += Span(cur, s.end, "block")
    }
    out.toSeq
  }

  /** Bounding fold: min begin / max end (vkit/element/box.py:58-74
    * Box.from_boxes).
    */
  def bounding(spans: Seq[Span]): Option[Span] =
    if (spans.isEmpty) None
    else Some(Span(spans.map(_.begin).min, spans.map(_.end).max, "block"))

  /** Context dilation: expand every span by `k` chars on each side,
    * clip to [0, limit), and merge the overlaps — snippet windows
    * around matches (vkit/element/box.py:205-219 to_dilated_box).
    */
  def dilate(spans: Seq[Span], k: Int, limit: Int): Seq[Span] = {
    require(k >= 0, "dilation must be non-negative")
    mergeTouching(spans.map(s =>
      Span(math.max(0, s.begin - k), math.min(limit, s.end + k), s.kind)))
  }

  /** Does any span in `a` overlap any span in `b`? (STRtree overlap
    * probe, vkit/element/box.py:419-428, via sorted sweep.)
    */
  def anyOverlap(a: Seq[Span], b: Seq[Span]): Boolean = {
    val as = sorted(a); val bs = sorted(b)
    var i = 0; var j = 0
    while (i < as.length && j < bs.length) {
      if (as(i).begin < bs(j).end && bs(j).begin < as(i).end) return true
      if (as(i).end <= bs(j).end) i += 1 else j += 1
    }
    false
  }
}
