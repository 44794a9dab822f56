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
  * - `lshTopK`: scale path — multi-table random-hyperplane LSH
  *   (OR-amplification across `nTables` independent tables of `nPlanes`
  *   hyperplanes each, the same band pattern as MinHash LSH) with 1-bit
  *   multi-probe on the query side, exact cosine rerank on candidates.
  *
  * Scale design: bucket keys are (table, bucket) pairs — 2^nPlanes
  * buckets PER TABLE (e.g. 16 planes -> 65k buckets/table), so bucket
  * occupancy stays ~N/2^nPlanes and the within-bucket candidate join
  * never degenerates into a quadratic scan; recall is recovered by
  * OR-ing `nTables` tables plus multi-probe, not by coarser buckets.
  * Vectors are NOT carried through the bucket shuffle — only slim
  * (table, bucket, id) rows move; vectors are joined back for the
  * candidate set alone.
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
    * SplitMix64 -> Box-Muller.
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

  /** `nTables` independent tables of `nPlanes` planes each. */
  def planeTables(nTables: Int, nPlanes: Int, dim: Int,
      seed: Long): Array[Array[Array[Double]]] = {
    val all = planes(nTables * nPlanes, dim, seed)
    Array.tabulate(nTables)(t =>
      all.slice(t * nPlanes, (t + 1) * nPlanes))
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

  @inline private def normalize(v: Seq[Float]): Array[Double] = {
    val a = new Array[Double](v.length)
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val inv = if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
    i = 0
    while (i < v.length) { a(i) = v(i) * inv; i += 1 }
    a
  }

  private def nearestCentroid(v: Seq[Float],
      cents: Array[Array[Double]]): Int = {
    val nv = normalize(v)
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      var dot = 0.0
      var i = 0
      val row = cents(c)
      val lim = math.min(row.length, nv.length)
      while (i < lim) { dot += row(i) * nv(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** Spherical k-means coarse quantizer: deterministic seeded init
    * (the nClusters corpus vectors with smallest mix64(id ^ seed) — a
    * reproducible sample, no wall-clock), then `iters` Lloyd rounds
    * computed as Spark aggregations (assign by max cosine against
    * broadcast centroids; new centroid = normalized member mean).
    * Centroid fitting is MODEL TRAINING: the nClusters x dim result is
    * collected to the driver by design (tiny), while assignments stay
    * distributed.
    */
  def trainIvfCentroids(spark: SparkSession, corpus: DataFrame,
      dim: Int, nClusters: Int, iters: Int = 3,
      seed: Long = 42L): Array[Array[Double]] = {
    import spark.implicits._
    val ds = corpus.as[(Long, Seq[Float])]
    val init = ds.map { case (id, v) =>
      (MinHashDedup.mix64(id ^ seed), v)
    }.toDF("h", "vec").orderBy($"h").limit(nClusters)
      .as[(Long, Seq[Float])].collect().map(x => normalize(x._2))
    var cents = init
    val k = init.length
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      // per-partition partial sums, reduced on the driver in PARTITION
      // ORDER — double addition is order-sensitive, and reduceByKey
      // merges in task-completion order, which would make the trained
      // centroids run-dependent in their last bits
      val partials = ds.mapPartitions { it =>
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Long](k)
        it.foreach { case (_, v) =>
          val c = nearestCentroid(v, bc.value)
          val nv = normalize(v)
          var i = 0
          while (i < dim && i < nv.length) {
            sums(c)(i) += nv(i); i += 1
          }
          counts(c) += 1
        }
        Iterator.single(
          (org.apache.spark.TaskContext.getPartitionId(),
            sums.map(_.toSeq).toSeq, counts.toSeq))
      }.collect().sortBy(_._1)
      val total = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      partials.foreach { case (_, sums, cnts) =>
        var c = 0
        while (c < k) {
          var i = 0
          while (i < dim) { total(c)(i) += sums(c)(i); i += 1 }
          counts(c) += cnts(c)
          c += 1
        }
      }
      val next = cents.clone()
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var s = 0.0
          var i = 0
          while (i < dim) { s += total(c)(i) * total(c)(i); i += 1 }
          val inv = if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
          next(c) = total(c).map(_ * inv)
        }
        c += 1
      }
      cents = next
    }
    cents
  }

  /** IVF ANN: spherical-kmeans coarse buckets; each query probes its
    * `nProbe` best centroids; candidates rerank by exact cosine.
    * Assignment is scale-invariant (cosine), so colinear near-dups
    * always land with their source — the recall property the planted-
    * twin oracle checks. Same output shape as bruteForceTopK.
    */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int, dim: Int, nClusters: Int = 16, nProbe: Int = 4,
      iters: Int = 3, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val cents = trainIvfCentroids(spark, corpus, dim, nClusters, iters,
      seed)
    val bc = spark.sparkContext.broadcast(cents)

    val corpusRows = corpus.as[(Long, Seq[Float])]
      .map { case (id, v) => (nearestCentroid(v, bc.value), id) }
      .toDF("bucket", "id")

    val queryProbes = queries.as[(Long, Seq[Float])]
      .flatMap { case (qid, v) =>
        val nv = normalize(v)
        val scored = bc.value.indices.map { c =>
          var dot = 0.0
          var i = 0
          val row = bc.value(c)
          val lim = math.min(row.length, nv.length)
          while (i < lim) { dot += row(i) * nv(i); i += 1 }
          (c, dot)
        }
        scored.sortBy { case (c, d) => (-d, c) }.take(nProbe)
          .map { case (c, _) => (c, qid) }
      }.toDF("bucket", "qid")

    val cand = corpusRows.join(broadcast(queryProbes), Seq("bucket"))
      .filter($"id" =!= $"qid")
      .select($"qid", $"id").distinct()

    val scored = corpus.join(cand, Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("sim", cosine($"qvec", $"vec"))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"rank", $"id")
  }

  /** LSH-bucketed ANN: corpus rows hash to (table, bucket) per table;
    * each query probes its own bucket plus all 1-bit flips in every
    * table; candidates rerank by exact cosine; top-k per query.
    * Same output shape as bruteForceTopK. `dim` is passed explicitly so
    * the plan stays action-free.
    */
  def lshTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int, dim: Int, nTables: Int = 4, nPlanes: Int = 16,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val pl = spark.sparkContext.broadcast(
      planeTables(nTables, nPlanes, dim, seed))

    // slim (tbl, bucket, id) rows — vectors stay behind
    val corpusRows = corpus.as[(Long, Seq[Float])]
      .flatMap { case (id, v) =>
        pl.value.iterator.zipWithIndex.map { case (t, ti) =>
          (ti, signBucket(v, t), id)
        }
      }.toDF("tbl", "bucket", "id")

    val queryProbes = queries.as[(Long, Seq[Float])]
      .flatMap { case (qid, v) =>
        pl.value.iterator.zipWithIndex.flatMap { case (t, ti) =>
          val b = signBucket(v, t)
          (Seq(b) ++ (0 until nPlanes).map(i => b ^ (1 << i)))
            .distinct.map(pb => (ti, pb, qid))
        }
      }.toDF("tbl", "bucket", "qid")

    val cand = corpusRows.join(broadcast(queryProbes),
        Seq("tbl", "bucket"))
      .filter($"id" =!= $"qid")
      .select($"qid", $"id").distinct()

    // vectors joined back for candidates only
    val scored = corpus.join(cand, Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("sim", cosine($"qvec", $"vec"))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"rank", $"id")
  }
}
