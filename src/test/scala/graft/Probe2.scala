package graft

import org.apache.spark.sql.SparkSession

/** Partition-count probe. sbt "Test/runMain graft.Probe2 32" */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val convs = 4000L
    val t = graft.synth.SynthTranscripts.turns(spark, convs)
    println("[p2] gen partitions: " + t.rdd.getNumPartitions)
    val dd = graft.pipe.Job.dedupe(spark, t)
    // materialize through an action with partition introspection
    val ddParts = dd.rdd.mapPartitions(it => Iterator(it.size)).collect()
    println("[p2] dedupe parts: " + ddParts.length + " sizes top5: " +
      ddParts.sorted.reverse.take(5).mkString(","))
    val (out, _) = graft.pipe.Job.run(spark, t, "p2")
    val parts = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    println("[p2] full-out parts: " + parts.length + " sizes top5: " +
      parts.sorted.reverse.take(5).mkString(",") + " nonzero: " +
      parts.count(_ > 0))
    val (out2, _) = graft.pipe.Job.run(spark, t, "p2b", orderOutput = false)
    val parts2 = out2.rdd.mapPartitions(it => Iterator(it.size)).collect()
    println("[p2] noorder parts: " + parts2.length + " sizes top5: " +
      parts2.sorted.reverse.take(5).mkString(",") + " nonzero: " +
      parts2.count(_ > 0))
    spark.stop()
  }
}
