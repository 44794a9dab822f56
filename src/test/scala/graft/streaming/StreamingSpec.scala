package graft.streaming

import graft.pipe.SparkTestSession
import graft.schema.Turn
import graft.synth.{GoldenData, SynthTranscripts}
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming extraction over a file source matches batch output, " +
    "resumes exactly-once across restarts") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-stream")
      .toString
    val inDir = s"$base/in"
    val outDir = s"$base/out"
    val ckDir = s"$base/ck"
    new java.io.File(inDir).mkdirs()

    def addFile(name: String, turns: Seq[Turn]): Unit = {
      spark.createDataset(turns).coalesce(1).write
        .parquet(s"$base/tmp-$name")
      val src = new java.io.File(s"$base/tmp-$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }

    val batch1 = (0 until 4).flatMap(c =>
      SynthTranscripts.genConv(42, c.toLong, 0, 0))
    val batch2 = (4 until 7).flatMap(c =>
      SynthTranscripts.genConv(42, c.toLong, 0, 0))
    addFile("b1", batch1)

    def runOnce(): Unit = {
      val stream = StreamingJob.readTurnStream(spark, inDir)
      val q = StreamingJob.writer(StreamingJob.extractStream(stream),
        outDir, ckDir).start()
      q.awaitTermination()
    }
    runOnce()
    val n1 = spark.read.parquet(outDir).count()
    assert(n1 == batch1.size)

    // restart with a new file: only new data processed (exactly-once)
    addFile("b2", batch2)
    runOnce()
    val out = spark.read.parquet(outDir)
    assert(out.count() == (batch1.size + batch2.size))

    // content equals the batch extractor's output
    val got = out.select("conv_id", "turn_idx", "extracted_text")
      .as[(String, Int, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for (t <- batch1 ++ batch2) {
      val ex = graft.extract.Extractor.extract(t)
      assert(got((t.conv_id, t.turn_idx)) == ex.extracted_text)
    }
  }

  test("watermarked windowed aggregation over the extracted stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val agg = StreamingJob.windowedStats(mem.toDS(),
      windowLen = "10 minutes", watermarkDelay = "1 hour")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    // 3 turns in one 10-min window, 1 in the next (ts step = 30s in
    // synth; craft explicit ts)
    // base aligned to a 10-minute epoch boundary so minutes 1/5/9 share
    // one window and 12 falls in the next
    def turn(idx: Int, min: Int) = graft.schema.Turn("wconv", idx,
      "user", s"turn number $idx content", "",
      new java.sql.Timestamp(1700000400000L + min * 60000L))
    mem.addData(turn(0, 1), turn(1, 5), turn(2, 9), turn(3, 12))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT n_turns, n_spans FROM win_out ORDER BY window.start")
      .collect()
    q.stop()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L, 1L))
    assert(rows.forall(_.getLong(1) >= 1L))
  }

  test("cross-batch dedupe with watermark keeps one row per turn") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val deduped = StreamingJob.withDedupe(mem.toDS())
    val q = StreamingJob.extractStream(deduped).writeStream
      .format("memory").queryName("dedupe_out")
      .outputMode("append").start()
    val t0 = GoldenData.edgeTurns.head
    mem.addData(t0)
    q.processAllAvailable()
    mem.addData(t0) // duplicate in a later micro-batch
    q.processAllAvailable()
    val n = spark.sql(
      "SELECT count(*) FROM dedupe_out WHERE conv_id = 'edge-empty' " +
        "AND turn_idx = 0").first().getLong(0)
    q.stop()
    assert(n == 1)
  }
}
