package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-3 measurement probe:
  *  (a) q_agg_fold re-measure under the interleave/min protocol
  *      (CLAUDE.md) — alternates q_agg_fold with a control query;
  *  (b) EmbeddingDedup nProbe recall/time curve on planted
  *      NON-colinear ~0.95-cosine twins (the regime multi-probe is
  *      for; colinear twins are found at any nProbe).
  */
object Probe12 {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(name: String): Double = time {
      SparkEntry.queries(name)(spark, sf)
        .write.mode("overwrite").format("noop").save()
    }

    // (a) interleaved q_agg_fold vs control, 5 reps each
    run("q_agg_fold"); run("q_topk") // warmup
    val agg = collection.mutable.ArrayBuffer[Double]()
    val ctl = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 5) { agg += run("q_agg_fold"); ctl += run("q_topk") }
    println(f"AGGFOLD reps=${agg.map(t => f"$t%.3f").mkString(",")} " +
      f"min=${agg.min}%.3f | control q_topk " +
      f"reps=${ctl.map(t => f"$t%.3f").mkString(",")} min=${ctl.min}%.3f")

    // (b) nProbe curve: 64-dim corpus + non-colinear twins at ~0.951
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val nBase = emb.count()
    val theta = math.toRadians(18.0) // cos ~ 0.951
    val (c0, s0) = (math.cos(theta).toFloat, math.sin(theta).toFloat)
    val twins = emb.as[(Long, Seq[Float])].map { case (id, v) =>
      // unit vector u orthogonal to v via Gram-Schmidt on a seeded
      // random direction; twin = cos*v + sin*|v|*u
      val r = new java.util.Random(id)
      val g = Array.fill(v.length)(r.nextGaussian())
      val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
      val dot = v.zip(g).map { case (a, b) => a * b }.sum / (nv * nv)
      val u0 = g.zip(v).map { case (gi, vi) => gi - dot * vi }
      val nu = math.sqrt(u0.map(x => x * x).sum)
      val twin = v.zip(u0).map { case (vi, ui) =>
        c0 * vi + s0 * (nv * ui / nu).toFloat }
      (id + 1000000L, twin.toSeq)
    }.toDF("id", "vec")
    val corpus = emb.union(twins).persist()
    corpus.count()
    for (np <- Seq(0, 2, 4, 8, 16)) {
      var found = 0L
      val t = time {
        found = graft.ops.EmbeddingDedup.nearDuplicates(spark, corpus,
          dim = 64, threshold = 0.94, nProbe = np)
          .filter($"id_b" === $"id_a" + 1000000L).count()
      }
      println(f"NPROBE np=$np%2d recall=${found.toDouble / nBase}%.3f " +
        f"($found/$nBase) wall=$t%.2f s")
    }
    spark.stop()
  }
}
