package graft

import org.apache.spark.sql.SparkSession
import graft.ops.MinHashDedup

/** Scale evidence for the incremental dedup index: over a growing
  * history, compare (a) FULL re-dedup of history+batch per arrival
  * (the naive daily job) vs (b) bandIndex once per batch + incremental
  * join against the stored index. The full job re-shingles the whole
  * history every day — O(H) per arrival; the incremental job signs
  * only the batch and joins slim index rows — O(B + matches).
  */
object Probe18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def synthDoc(i: Long): String = {
      var s = MinHashDedup.mix64(i * 31 + 7)
      val words = new StringBuilder
      var w = 0
      while (w < 60) {
        s = MinHashDedup.mix64(s)
        words.append("w").append(java.lang.Long.toUnsignedString(s % 50000))
          .append(' ')
        w += 1
      }
      words.toString.trim
    }
    val histN = 200000L
    val batchN = 10000L
    val hist = spark.range(histN)
      .select($"id", $"id".as("seed")).as[(Long, Long)]
      .map { case (id, seed) => (id, synthDoc(seed)) }
      .toDF("id", "text").cache()
    hist.count() // materialize input outside timing
    // every 4th batch doc is a near-dup of a history doc
    val batch = spark.range(batchN).as[Long]
      .map { i =>
        if (i % 4 == 0) (histN + i, synthDoc(i * 20) + " tail x")
        else (histN + i, synthDoc(1000000L + i))
      }.toDF("id", "text").cache()
    batch.count()

    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-p18").toString
    val (_, tIndex) = time {
      MinHashDedup.bandIndex(spark, hist.as[(Long, String)])
        .write.mode("overwrite").parquet(idxDir)
    }
    val (nInc, tInc) = time {
      MinHashDedup.nearDuplicatesIncremental(spark,
        spark.read.parquet(idxDir), hist.as[(Long, String)],
        batch.as[(Long, String)]).count()
    }
    val (nFull, tFull) = time {
      MinHashDedup.nearDuplicates(spark,
        hist.union(batch).as[(Long, String)]).count()
    }
    println(f"[p18] history=$histN batch=$batchN | index build " +
      f"(once) $tIndex%.1f s | incremental per batch $tInc%.1f s " +
      f"($nInc pairs) | full re-dedup per batch $tFull%.1f s " +
      f"($nFull pairs incl. history-internal)")
    spark.stop()
  }
}
