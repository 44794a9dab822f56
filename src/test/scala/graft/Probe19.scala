package graft

import org.apache.spark.sql.SparkSession

/** Probe19 — sf0.1 -> "sf1" (10x synthetic documents) data-path scaling
  * of the heavy query families. The sf0.1 walls for the cleanse/dedup
  * family are AQE-stage-floor-bound (~0.25-0.5 s/stage on this box,
  * Probe7/9), i.e. they measure SCHEDULING, not the data path; this
  * probe answers the question that matters at 100 TB: does 10x the
  * data cost <= ~10x the time once the floor amortizes?
  *
  * Protocol: stage a 10x documents table (10 offset copies of the
  * sf0.1 table, ids k*100000+id — offsets stay clear of every planted
  * twin range), then run each heavy query on BOTH dirs in interleaved
  * passes (noise protocol per BENCH/BASELINE.md), reporting per-query
  * minima and the sf1/sf0.1 ratio.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.Probe19"
  */
object Probe19 {

  val Heavy = Seq("t_corpus_cleanse", "t_dedup_minhash",
    "t_ngram_jaccard", "t_media_ann_lsh", "t_containment",
    "t_dedup_conv", "t_decontaminate", "t_bm25", "t_lm_score",
    "t_pack")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val sf1 = "/tmp/graft-sf1"
    if (!new java.io.File(s"$sf1/documents.parquet").exists()) {
      val docs = spark.read.parquet(s"$sf01/documents.parquet")
      (0 until 10).map(k =>
          docs.withColumn("doc_id", $"doc_id" + k * 100000L))
        .reduce(_ unionByName _)
        .repartition(8)
        .write.mode("overwrite").parquet(s"$sf1/documents.parquet")
    }

    def runOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup both scales once (JIT/codegen), then interleaved timed
    // passes: (q1 sf0.1, q1 sf1, q2 sf0.1, ...) x k so a noise burst
    // cannot tar one (query, scale) cell
    Heavy.foreach { q => runOnce(q, sf01); runOnce(q, sf1) }
    val k = 2
    val times = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to k; q <- Heavy; dir <- Seq(sf01, sf1))
      times((q, dir)) ::= runOnce(q, dir)
    println(f"${"query"}%-18s ${"sf0.1 min"}%10s ${"sf1 min"}%10s ratio")
    Heavy.foreach { q =>
      val a = times((q, sf01)).min
      val b = times((q, sf1)).min
      println(f"$q%-18s $a%10.2f $b%10.2f ${b / a}%5.2f")
    }
    spark.stop()
  }
}
