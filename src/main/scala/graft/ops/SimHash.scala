package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash near-dup detection: 64-bit token-weighted fingerprint +
  * pigeonhole blocking for Hamming-distance candidate search.
  *
  * Scale: for max distance d, a 64-bit hash is split into d+1 blocks —
  * any pair within distance d agrees on >= 1 whole block (pigeonhole),
  * so candidates come from equality joins on (block_idx, block_value):
  * slim shuffle keys, no quadratic scan. Exact Hamming verify after.
  */
object SimHash {

  def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    for (tok <- text.split(' ') if tok.nonEmpty) {
      val h = MinHashDedup.mix64(MinHashDedup.hashString(tok))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def blockRows(spark: SparkSession,
      docs: Dataset[(Long, String)], nBlocks: Int): DataFrame = {
    import spark.implicits._
    val width = 64 / nBlocks
    docs.map { case (id, t) => (id, simhash64(t)) }
      .flatMap { case (id, h) =>
        (0 until nBlocks).iterator.map { b =>
          val lo = b * width
          val w = if (b == nBlocks - 1) 64 - lo else width
          val mask = if (w == 64) -1L else (1L << w) - 1L
          (b, (h >>> lo) & mask, id, h)
        }
      }.toDF("blk", "bv", "id", "h")
  }

  /** Buckets pruned by the cap — the recall-loss ledger (see
    * MinHashDedup.oversizedBuckets).
    */
  def oversizedBuckets(spark: SparkSession, docs: Dataset[(Long, String)],
      maxDist: Int = 3, bucketCap: Int = 64): DataFrame = {
    import spark.implicits._
    blockRows(spark, docs, maxDist + 1)
      .groupBy($"blk", $"bv").agg(count(lit(1)).as("n"))
      .filter($"n" > bucketCap)
  }

  /** Pairs with Hamming(simhash) <= maxDist; id_a < id_b. `ledger` (if
    * given) observes dropped bucket/row counts on the same count pass
    * (see MinHashDedup.observeDrops).
    */
  def nearDuplicates(spark: SparkSession, docs: Dataset[(Long, String)],
      maxDist: Int = 3, bucketCap: Int = 64,
      ledger: Observation = null): DataFrame = {
    import spark.implicits._
    val nBlocks = maxDist + 1

    // simhashing is one mix64+64-bit vote per token — spread a narrow
    // scan so it parallelizes, and materialize the slim block rows
    // once for their two consumers (count pass + bucket join), the
    // MinHashDedup band-rows discipline
    val blocks = blockRows(spark,
      MinHashDedup.spreadIfNarrow(docs), nBlocks)
      .localCheckpoint()

    // count pass first, so a degenerate bucket (e.g. millions of docs
    // sharing a simhash block) is pruned as one (blk, bv, n) row and
    // never materialized in a collect_list aggregation buffer
    val keptKeys = MinHashDedup.observeDrops(
      blocks.groupBy($"blk", $"bv").agg(count(lit(1)).as("n")),
      bucketCap, ledger)
      .filter($"n" > 1 && $"n" <= bucketCap)
      .select($"blk", $"bv")

    val buckets = blocks.join(keptKeys, Seq("blk", "bv"))
      .groupBy($"blk", $"bv")
      .agg(collect_list(struct($"id", $"h")).as("xs")) // <= bucketCap

    buckets.select(explode(expr(
      """flatten(transform(xs, (x, i) ->
           transform(slice(xs, i + 2, size(xs)), y ->
             struct(least(x.id, y.id) AS a, greatest(x.id, y.id) AS b,
                    if(x.id <= y.id, x.h, y.h) AS ha,
                    if(x.id <= y.id, y.h, x.h) AS hb))))""")).as("p"))
      .select($"p.a".as("id_a"), $"p.b".as("id_b"), $"p.ha", $"p.hb")
      .distinct()
      .as[(Long, Long, Long, Long)]
      .map { case (a, b, ha, hb) => (a, b, hamming(ha, hb)) }
      .toDF("id_a", "id_b", "dist")
      .filter($"dist" <= maxDist && $"id_a" =!= $"id_b")
  }
}
