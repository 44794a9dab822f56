package graft.pipe

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import graft.schema.{ExtractedTurn, LineageRow, Turn}
import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path

/** Snapshot-incremental resume (the north rule's "resumable from Iceberg
  * snapshot checkpoints", expressed against the sandbox's parquet
  * directories — same contract, file-manifest granularity: on a real
  * Iceberg table the manifest is the last-processed snapshot id and the
  * incremental read is `option("start-snapshot-id", ...)`).
  *
  * State layout under `stateDir`:
  *   manifest.txt  — one processed input file path per line (committed
  *                   AFTER output+lineage are durably written, so a crash
  *                   between write and commit reprocesses idempotently —
  *                   extraction is deterministic, so replays are safe).
  */
object Checkpoint {

  def listInputFiles(spark: SparkSession, inputDir: String): Seq[String] = {
    val path = new Path(inputDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Seq.empty
    fs.listStatus(path).toSeq.map(_.getPath.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .sorted
  }

  def processedFiles(spark: SparkSession, stateDir: String): Set[String] = {
    val p = new Path(stateDir, "manifest.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  def commitFiles(spark: SparkSession, stateDir: String,
      files: Seq[String]): Unit = {
    val prev = processedFiles(spark, stateDir)
    val all = (prev ++ files).toSeq.sorted
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val tmp = new Path(stateDir, "manifest.txt.tmp")
    val out = fs.create(tmp, true)
    try out.write((all.mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fin = new Path(stateDir, "manifest.txt")
    fs.delete(fin, false)
    fs.rename(tmp, fin) // atomic commit point
  }

  /** One incremental run: process only input files not yet in the
    * manifest; append extracted output + lineage; then commit the
    * manifest. Returns number of new files processed.
    */
  def runIncremental(spark: SparkSession, inputDir: String,
      outputDir: String, stateDir: String, runId: String): Int = {
    import spark.implicits._
    val todo = listInputFiles(spark, inputDir)
      .filterNot(processedFiles(spark, stateDir))
    if (todo.isEmpty) return 0
    val turns = spark.read.parquet(todo: _*).as[Turn]
    val (out, acc) = Job.run(spark, turns, runId)
    out.write.mode(SaveMode.Append).parquet(s"$outputDir/extracted")
    Job.lineage(spark, acc).write.mode(SaveMode.Append)
      .parquet(s"$outputDir/lineage")
    commitFiles(spark, stateDir, todo)
    todo.length
  }
}
