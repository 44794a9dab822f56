package graft.pipe

import graft.schema.Turn
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.io.File
import java.nio.file.Files

/** Child JVM for ResumeKillSpec: processes the first half of the
  * staged input as increment r1, stages an orphan run directory (the
  * crash-window artifact), then HALTS — Runtime.halt runs no shutdown
  * hooks, no spark.stop, no finally blocks: a real process death, not
  * a simulated one.
  */
object ResumeKillChild {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val inDir = new File(s"$root/in"); inDir.mkdirs()
    val parts = new File(s"$root/all").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.take(4).foreach(f => Files.move(f.toPath,
      new File(inDir, f.getName).toPath))
    val n = Checkpoint.runIncremental(spark, inDir.toString,
      s"$root/out", s"$root/state", "r1")
    // crash window: staged output that never reached the manifest
    spark.read.parquet(s"$root/out/extracted/run=r1")
      .write.mode("overwrite").parquet(s"$root/out/extracted/run=zz-orphan")
    println(s"CHILD_DONE $n")
    System.out.flush()
    Runtime.getRuntime.halt(42)
  }
}

class ResumeKillSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val childOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("resume survives a REAL JVM kill: a child process commits half " +
    "the input, stages an orphan, and halts; a fresh session resumes " +
    "exactly the remainder and equals the single-shot run") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-resumekill").toString
    // conv-partitioned staging so per-increment dedupe composes
    graft.synth.SynthTranscripts.turns(spark, 200, partitions = 8)
      .toDF().repartition(8, $"conv_id")
      .write.mode("overwrite").parquet(s"$root/all")

    val java = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(java) ++ childOpens ++ Seq("-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      "graft.pipe.ResumeKillChild", root)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = scala.io.Source
      .fromInputStream(proc.getInputStream, "UTF-8").getLines().toVector
    val exit = proc.waitFor()
    assert(exit == 42, s"child exit $exit:\n${out.takeRight(15).mkString("\n")}")
    assert(out.exists(_.startsWith("CHILD_DONE 4")),
      out.takeRight(15).mkString("\n"))

    // the dead JVM left: a committed r1, an orphan staged dir, and 4
    // unprocessed files. Resume in THIS session.
    val inDir = new File(s"$root/in")
    new File(s"$root/all").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .foreach(f => Files.move(f.toPath,
        new File(inDir, f.getName).toPath))
    val n2 = Checkpoint.runIncremental(spark, inDir.toString,
      s"$root/out", s"$root/state", "r2")
    assert(n2 == 4, s"resume processed $n2 files, expected exactly 4")
    assert(Checkpoint.runIncremental(spark, inDir.toString,
      s"$root/out", s"$root/state", "r2") == 0) // replay no-op

    val manifest = Checkpoint.readManifest(spark, s"$root/state")
    assert(manifest.runs == Set("r1", "r2"))
    assert(manifest.files.size == 8)

    val resumed = Checkpoint.readCommitted(spark, s"$root/out",
      s"$root/state", "extracted")
    val (single, _) = Job.run(spark,
      spark.read.parquet(inDir.toString).as[Turn], "single",
      orderOutput = false)
    assert(resumed.count() == single.toDF().count())
    assert(resumed.except(single.toDF()).isEmpty &&
      single.toDF().except(resumed).isEmpty,
      "resumed union differs from the single-shot run")
  }
}
