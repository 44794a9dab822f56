package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (Array[Float]).
  *
  * - `cosine`: codegen'd higher-order-function expression (zip_with +
  *   aggregate) — no UDF, stays inside WholeStageCodegen.
  * - `bruteForceTopK`: exact baseline — broadcast the (small) query set,
  *   score the corpus in one narrow pass, per-query top-k via window.
  * - `lshTopK`: scale path — random-hyperplane sign buckets (deterministic
  *   seed), equality-join on bucket, exact rerank inside buckets with
  *   multi-probe (all 1-bit flips) so recall survives plane boundaries.
  */
object Ann {

  /** Cosine similarity of two array<float/double> columns, in doubles. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) =>
      x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (na * nb)
  }

  /** Exact top-k: for each row of `queries` (qid, qvec), the k nearest
    * corpus rows (id, vec) by cosine, excluding qid == id.
    * Output: (qid, rank, id) — ranks deterministic via (sim desc, id).
    */
  def bruteForceTopK(spark: SparkSession, corpus: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val scored = corpus.crossJoin(broadcast(queries))
      .filter($"id" =!= $"qid")
      .withColumn("sim", cosine($"qvec", $"vec"))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"rank", $"id")
  }

  /** Deterministic random hyperplanes: nPlanes x dim, N(0,1)-ish via
    * SplitMix64 -> uniform sum (CLT approximation is fine for LSH).
    */
  def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        val u1 = (MinHashDedup.mix64(seed + p * 1024L + d) >>> 11) *
          1.1102230246251565e-16
        val u2 = (MinHashDedup.mix64(seed ^ (p * 7919L + d * 31L)) >>> 11) *
          1.1102230246251565e-16
        math.sqrt(-2.0 * math.log(u1 + 1e-12)) *
          math.cos(2.0 * math.Pi * u2)
      }
    }

  def signBucket(vec: Seq[Float], pl: Array[Array[Double]]): Int = {
    var bucket = 0
    var p = 0
    while (p < pl.length) {
      var dot = 0.0
      var i = 0
      val row = pl(p)
      while (i < row.length && i < vec.length) {
        dot += row(i) * vec(i); i += 1
      }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** LSH-bucketed ANN: candidates = corpus rows sharing the query's
    * bucket or any 1-bit-flip neighbor bucket (multi-probe), exact
    * cosine rerank, top-k. Same output shape as bruteForceTopK.
    */
  def lshTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int, nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val dim = corpus.select(size($"vec")).first().getInt(0)
    val pl = spark.sparkContext.broadcast(planes(nPlanes, dim, seed))

    val corpusB = corpus.as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, signBucket(v, pl.value)) }
      .toDF("id", "vec", "bucket")

    val queryB = queries.as[(Long, Seq[Float])]
      .flatMap { case (qid, v) =>
        val b = signBucket(v, pl.value)
        // multi-probe: own bucket + all 1-bit flips
        (Seq(b) ++ (0 until pl.value.length).map(i => b ^ (1 << i)))
          .distinct.map(pb => (qid, v, pb))
      }.toDF("qid", "qvec", "bucket")

    val scored = corpusB.join(broadcast(queryB), "bucket")
      .filter($"id" =!= $"qid")
      .withColumn("sim", cosine($"qvec", $"vec"))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"rank", $"id")
  }
}
