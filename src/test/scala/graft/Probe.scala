package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main: stage-level timing at a given core count.
  *   sbt "Test/runMain graft.Probe 8"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val convs = if (args.length > 1) args(1).toLong else 4000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      // warmup
      f
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-28s $dt%8.3f s  rows=$n")
    }

    time("gen only") {
      graft.synth.SynthTranscripts.turns(spark, convs).count()
    }
    time("gen + dedupe") {
      val t = graft.synth.SynthTranscripts.turns(spark, convs)
      graft.pipe.Job.dedupe(spark, t).count()
    }
    time("full (dedupe+order+extract)") {
      val t = graft.synth.SynthTranscripts.turns(spark, convs)
      val (out, _) = graft.pipe.Job.run(spark, t, "probe")
      out.count()
    }
    time("bench-style collect") {
      Bench.extractionRun(spark, convs)
    }
    spark.stop()
  }
}
