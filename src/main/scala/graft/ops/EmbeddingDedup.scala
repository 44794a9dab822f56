package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate detection: random-hyperplane LSH
  * buckets (deterministic planes) + 1-bit multi-probe + exact cosine
  * verification — the scale path for "same content, same embedding"
  * dedup. Exact cosine is the final arbiter (LSH = recall only).
  *
  * Multi-probe note: a pair at cosine ~0.95 sits within ~18 degrees;
  * with 8 planes the expected sign-flips is ~0.8, so probing all 1-bit
  * neighbor buckets recovers the dominant miss mode; raise probes or
  * lower planes for higher-recall regimes.
  */
object EmbeddingDedup {

  /** Input: (id: Long, vec: array<float>). Output (id_a, id_b) pairs
    * with cosine >= threshold, id_a < id_b.
    */
  def nearDuplicates(spark: SparkSession, corpus: DataFrame,
      threshold: Double = 0.95, nPlanes: Int = 8,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val dim = corpus.select(size($"vec")).first().getInt(0)
    val pl = spark.sparkContext.broadcast(Ann.planes(nPlanes, dim, seed))

    val bucketed = corpus.as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, Ann.signBucket(v, pl.value)) }
      .toDF("id", "vec", "bucket")

    val probes = corpus.as[(Long, Seq[Float])]
      .flatMap { case (id, v) =>
        val b = Ann.signBucket(v, pl.value)
        (Seq(b) ++ (0 until nPlanes).map(i => b ^ (1 << i)))
          .distinct.map(pb => (id, v, pb))
      }.toDF("id_a", "vec_a", "bucket")

    probes.join(bucketed.select($"id".as("id_b"), $"vec".as("vec_b"),
        $"bucket"), "bucket")
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"vec_a", $"vec_b")
      // dedupe multi-probe hits on the slim id pair, not on the full
      // vector payload (vecs are functionally determined by the ids)
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", Ann.cosine($"vec_a", $"vec_b"))
      .filter($"sim" >= threshold)
      .select($"id_a", $"id_b")
  }
}
