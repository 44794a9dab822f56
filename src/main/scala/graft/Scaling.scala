package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling run (BASELINE.md section 3): the sandbox
  * stand-in for the north rule's "N and 4N executors" criterion — the
  * identical extraction job at local[8] and local[32] over the same
  * deterministic input, reporting throughput at both and
  * efficiency = T(4N) / (4 * T(N)). Warmup excluded, median of 3,
  * MAD outlier trim (the reference's robust-min formula,
  * vkit/pipeline/text_detection/page_resizing.py:64-84).
  *
  * Usage: sbt "runMain graft.Scaling [numConvs]"
  */
object Scaling {

  /** Keep values whose |x - median| / MAD < 3.5 (NIST / reference rule). */
  def madTrim(xs: Seq[Double]): Seq[Double] = {
    val med = Bench.median(xs)
    val mad = Bench.median(xs.map(x => math.abs(x - med)))
    if (mad == 0.0) xs
    else xs.filter(x => math.abs(x - med) / mad < 3.5)
  }

  def runAt(cores: Int, numConvs: Long): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var rows = 0L
    rows = Bench.extractionRun(spark, numConvs) // warmup
    val times = (1 to 3).map(_ =>
      Bench.timeIt { rows = Bench.extractionRun(spark, numConvs) })
    spark.stop()
    // allow a fresh master on the next call
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    (rows, Bench.median(madTrim(times)))
  }

  def main(args: Array[String]): Unit = {
    val numConvs = if (args.nonEmpty) args(0).toLong else 4000L
    val n = 8
    val n4 = 32
    val (rows1, tN) = runAt(n, numConvs)
    val (rows2, t4N) = runAt(n4, numConvs)
    require(rows1 == rows2, s"row count drift: $rows1 vs $rows2")
    val thrN = rows1 / tN
    val thr4N = rows2 / t4N
    val eff = thr4N / (4.0 * thrN)
    println(f"""{"rows":$rows1,"cores_n":$n,"cores_4n":$n4,""" +
      f""""sec_n":$tN%.3f,"sec_4n":$t4N%.3f,""" +
      f""""turns_per_sec_n":${thrN.toLong},""" +
      f""""turns_per_sec_4n":${thr4N.toLong},""" +
      f""""scaling_efficiency":$eff%.3f}""")
  }
}
