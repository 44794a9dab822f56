package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling run (BASELINE.md section 3): the sandbox
  * stand-in for the north rule's "N and 4N executors" criterion — the
  * identical extraction job at local[N] and local[4N] over the same
  * materialized input, reporting throughput at both and
  * efficiency = thr(4N) / (4 * thr(N)).
  *
  * Each measurement runs in a FRESH child JVM: a second SparkSession in
  * the same JVM measures ~2x slower (heap/codecache debris from the
  * first), which silently corrupts the comparison. Warmup excluded,
  * median of 3, MAD outlier trim (the reference's robust rule,
  * vkit/pipeline/text_detection/page_resizing.py:64-84).
  *
  * Usage: sbt "runMain graft.Scaling [numConvs] [N] [4N]"
  * (child mode, internal: --single <cores> <numConvs>)
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
      // FIXED partition count on both legs (not = cores): per-partition
      // sort/shuffle volume must be equal across N and 4N, or the
      // low-core leg sorts 4x-bigger partitions and spills — measuring
      // memory pressure, not parallel efficiency. 32 matches the
      // driver/Bench config; a real cluster sizes partitions by
      // maxPartitionBytes/AQE, independent of executor count.
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var rows = 0L
    rows = Bench.extractionRun(spark, numConvs) // warmup
    val times = (1 to 3).map(_ =>
      Bench.timeIt { rows = Bench.extractionRun(spark, numConvs) })
    spark.stop()
    (rows, Bench.median(madTrim(times)))
  }

  private val childOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Fork a fresh JVM running `--single cores numConvs`; parse its
    * result line "SCALING_SINGLE rows sec".
    */
  def forkRun(cores: Int, numConvs: Long): (Long, Double) = {
    val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
    val java = System.getProperty("java.home") + "/bin/java"
    // optional extra child-JVM flags (e.g. a GC experiment:
    // SPARK_GRAFT_CHILD_JVM="-XX:+UseParallelGC") — applied to BOTH
    // legs, so the ratio stays a fair comparison
    val extra = sys.env.get("SPARK_GRAFT_CHILD_JVM")
      .map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
    val cmd = Seq(java) ++ childOpens ++ extra ++ Seq(
      s"-Xmx$mem", s"-Xms$mem", "-XX:+AlwaysPreTouch",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.Scaling", "--single", cores.toString, numConvs.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
      .getLines().toVector
    proc.waitFor()
    out.find(_.startsWith("SCALING_SINGLE ")) match {
      case Some(line) =>
        val parts = line.split(' ')
        (parts(1).toLong, parts(2).toDouble)
      case None =>
        sys.error("child run produced no result:\n" +
          out.takeRight(20).mkString("\n"))
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "--single") {
      val (rows, sec) = runAt(args(1).toInt, args(2).toLong)
      println(s"SCALING_SINGLE $rows $sec")
      return
    }
    val numConvs = if (args.nonEmpty) args(0).toLong else 4000L
    val n = if (args.length > 1) args(1).toInt else 8
    val n4 = if (args.length > 2) args(2).toInt else 4 * n

    // materialize the shared input once, in-process
    val prep = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")).getOrCreate()
    prep.sparkContext.setLogLevel("WARN")
    Bench.ensureInput(prep, numConvs)
    prep.stop()

    // interleave A/B/A/B across fresh JVMs and take per-config minima:
    // the box has multi-second noise bursts, and interleaving prevents a
    // burst from biasing one config
    val results = Seq(n, n4, n, n4).map(c => c -> forkRun(c, numConvs))
    val rows1 = results.head._2._1
    require(results.forall(_._2._1 == rows1), "row count drift")
    val tN = results.filter(_._1 == n).map(_._2._2).min
    val t4N = results.filter(_._1 == n4).map(_._2._2).min
    val rows2 = rows1
    val thrN = rows1 / tN
    val thr4N = rows2 / t4N
    val eff = thr4N / (n4.toDouble / n * thrN)
    println(f"""{"rows":$rows1,"cores_n":$n,"cores_4n":$n4,""" +
      f""""sec_n":$tN%.3f,"sec_4n":$t4N%.3f,""" +
      f""""turns_per_sec_n":${thrN.toLong},""" +
      f""""turns_per_sec_4n":${thr4N.toLong},""" +
      f""""scaling_efficiency":$eff%.3f}""")
  }
}
