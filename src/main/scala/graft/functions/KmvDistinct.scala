package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

import graft.ops.MinHashDedup

/** Bounded-state KMV state: the k smallest DISTINCT unsigned mix64
  * hashes seen so far. Memory per group is O(k) REGARDLESS of group
  * size — the property that makes per-key distinct counting feasible
  * over a 100 TB corpus (a billion-row group costs the same 2 KiB of
  * aggregation state as a thousand-row one).
  */
final class KmvState(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long](
    new java.util.Comparator[java.lang.Long] {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })

  def add(h: Long): Unit =
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last) < 0 &&
      set.add(h)) { set.pollLast(); () }
}

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002) as a
  * native Catalyst aggregate — the same `TypedImperativeAggregate`
  * mechanism Spark's own HLL++ uses, but with a DETERMINISTIC,
  * integer-only estimator that the DuckDB oracle reproduces bit for
  * bit (SplitMix64 in mod-2^64 HUGEINT arithmetic + the same
  * ((k-1)<<64)/h_k floor division). Hashes the child long through
  * mix64; partials merge by set-union-with-cap, so map-side combine
  * works and shuffle traffic is <= k longs per (group, mapper).
  *
  * Estimate: exact size while < k distinct hashes seen; otherwise
  * floor((k-1) * 2^64 / h_k) with h_k the k-th smallest unsigned
  * hash (relative error ~ 1/sqrt(k-2); k=256 -> ~6%).
  */
case class KmvDistinct(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvState] {

  require(k >= 2 && k <= (1 << 20), s"kmv k out of range: $k")

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(b: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) b.add(MinHashDedup.mix64(v.asInstanceOf[Long]))
    b
  }

  override def merge(b: KmvState, o: KmvState): KmvState = {
    o.set.forEach(h => b.add(h))
    b
  }

  // estimate clamps at Long.MaxValue: adversarial inputs whose k
  // smallest hashes are tiny (constructible via the mix64 inverse)
  // push it past Long range — saturate instead of wrapping negative;
  // the DuckDB mirror applies the same least(...) clamp
  override def eval(b: KmvState): Any = KmvDistinct.estimate(b, k)

  override def serialize(b: KmvState): Array[Byte] =
    KmvDistinct.serializeState(b)

  override def deserialize(bytes: Array[Byte]): KmvState =
    KmvDistinct.deserializeState(k, bytes)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_distinct requires a BIGINT argument, " +
        s"got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(
      newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_kmv_distinct"
}

object KmvDistinct {

  /** Shared estimator over a KMV state (see KmvDistinct.eval). */
  private[functions] def estimate(b: KmvState, k: Int): Long = {
    val n = b.set.size
    if (n < k) n.toLong
    else {
      val kthU = BigInt(b.set.last) & ((BigInt(1) << 64) - 1)
      val est = (BigInt(k - 1) << 64) / kthU
      if (est > Long.MaxValue) Long.MaxValue else est.toLong
    }
  }

  private[functions] def serializeState(b: KmvState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.set.size)
    bb.putInt(b.set.size)
    b.set.forEach(h => { bb.putLong(h); () })
    bb.array
  }

  private[functions] def deserializeState(k: Int,
      bytes: Array[Byte]): KmvState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new KmvState(k)
    var i = 0
    while (i < n) { st.set.add(bb.getLong); i += 1 }
    st
  }

  /** Column API: `kmvDistinct($"url_hash", 256)`. */
  def kmvDistinct(col: Column, k: Int): Column =
    ColumnBridge.column(
      KmvDistinct(ColumnBridge.expression(col), k)
        .toAggregateExpression())

  /** Column API: aggregate a group into a PERSISTABLE sketch blob. */
  def kmvSketch(col: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(col), k)
        .toAggregateExpression())

  /** Column API: merge stored sketch blobs into a distinct estimate. */
  def kmvMergeEstimate(col: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMergeEstimate(ColumnBridge.expression(col), k)
        .toAggregateExpression())

  /** DuckDB mirror of `MinHashDedup.mix64(v)` for BIGINT `v` >= 0, in
    * mod-2^64 HUGEINT arithmetic (big-constant multiplies split into
    * 32-bit halves to stay inside INT128) — the same chain the
    * t_dedup_simhash oracle uses. Yields the hash in [0, 2^64).
    */
  def mix64Sql(v: String): String = {
    val M = "18446744073709551616::HUGEINT" // 2^64
    def mulSplit(z: String, c: String): String =
      s"(((($z >> 32) * $c::HUGEINT) % 4294967296::HUGEINT) * " +
        s"4294967296::HUGEINT + ($z % 4294967296::HUGEINT) * " +
        s"$c::HUGEINT) % $M"
    val z0 = s"(($v::HUGEINT + 11400714819323198485::HUGEINT) % $M)"
    val z1 = s"xor($z0, $z0 >> 30)"
    val z2 = mulSplit(z1, "13787848793156543929")
    val z3 = s"xor(($z2), ($z2) >> 27)"
    val z4 = mulSplit(s"($z3)", "10723151780598845931")
    s"xor(($z4), ($z4) >> 31)"
  }
}

/** Sketch-STORE form of the KMV aggregate: groups collapse to a
  * persistable binary blob (the serialized k-smallest-distinct-hash
  * state) instead of a final estimate. The 100 TB pattern this
  * enables: compute per-slice sketches (per day, per source, per
  * shard) ONCE, store the <= (4 + 8k)-byte blobs in a tiny table, and
  * answer any distinct-count over any slice combination later by
  * MERGING blobs (`KmvMergeEstimate`) — no rescan of the raw data.
  * Exactness of composition: the k smallest distinct hashes of a
  * union are contained in the union of each part's k smallest, so
  * merge-of-sketches equals the sketch of the union EXACTLY (the
  * oracle leans on this property).
  */
case class KmvSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvState] {

  require(k >= 2 && k <= (1 << 20), s"kmv k out of range: $k")

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(b: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) b.add(MinHashDedup.mix64(v.asInstanceOf[Long]))
    b
  }

  override def merge(b: KmvState, o: KmvState): KmvState = {
    o.set.forEach(h => b.add(h))
    b
  }

  override def eval(b: KmvState): Any = KmvDistinct.serializeState(b)

  override def serialize(b: KmvState): Array[Byte] =
    KmvDistinct.serializeState(b)
  override def deserialize(bytes: Array[Byte]): KmvState =
    KmvDistinct.deserializeState(k, bytes)

  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_sketch requires a BIGINT argument, " +
        s"got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_kmv_sketch"
}

/** Merge stored KMV sketch blobs (from `KmvSketch`) into one distinct
  * estimate. The blobs' k must match this aggregate's k (the state
  * format carries no parameters — the sketch table's schema owns
  * them, like any sketch store).
  */
case class KmvMergeEstimate(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvState] {

  require(k >= 2 && k <= (1 << 20), s"kmv k out of range: $k")

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(b: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      // k-mismatch guard (detectable direction): a blob carrying MORE
      // than k hashes was written with a larger k — merging it here
      // would silently change the estimator's h_k. The opposite
      // direction (blob written with a SMALLER k over a big slice) is
      // indistinguishable from a legitimately small slice and stays a
      // documented contract: the sketch table's k must match.
      val n = java.nio.ByteBuffer.wrap(bytes).getInt
      require(n <= k,
        s"graft_kmv_merge(k=$k) got a sketch blob with $n hashes — " +
          s"written with a larger k; sketch and merge k must match")
      val o = KmvDistinct.deserializeState(k, bytes)
      o.set.forEach(h => b.add(h))
    }
    b
  }

  override def merge(b: KmvState, o: KmvState): KmvState = {
    o.set.forEach(h => b.add(h))
    b
  }

  override def eval(b: KmvState): Any = KmvDistinct.estimate(b, k)

  override def serialize(b: KmvState): Array[Byte] =
    KmvDistinct.serializeState(b)
  override def deserialize(bytes: Array[Byte]): KmvState =
    KmvDistinct.deserializeState(k, bytes)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_merge requires a BINARY sketch argument, " +
        s"got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(
      newOffset: Int): KmvMergeEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): KmvMergeEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_kmv_merge"
}
