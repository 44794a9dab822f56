package graft.pipe

import graft.extract.Extractor
import graft.schema.{ExtractedTurn, Turn}
import graft.synth.{GoldenData, SynthTranscripts}
import graft.text.Json
import graft.text.Json._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all Spark-backed suites. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // isolated warehouse for bucketed-table tests (saveAsTable would
      // otherwise land ./spark-warehouse inside the repo)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Golden row as parsed from the committed JSONL. */
case class Golden(convId: String, turnIdx: Int, extractor: String,
    text: String, spans: Seq[(Int, Int, String)], error: String,
    version: String)

object Golden {
  def load(): Seq[Golden] = {
    val in = getClass.getResourceAsStream("/golden/golden_small.jsonl")
    require(in != null, "golden_small.jsonl missing from test resources")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toVector
    lines.map { l =>
      val JObj(f) = Json.parse(l): @unchecked
      val o = JObj(f)
      def str(k: String) = o.get(k) match {
        case Some(JStr(v, _, _)) => v
        case x => sys.error(s"bad $k: $x")
      }
      def int(k: String) = o.get(k) match {
        case Some(JNum(v)) => v.toInt
        case x => sys.error(s"bad $k: $x")
      }
      val spans = o.get("spans") match {
        case Some(JArr(items)) => items.map { case JObj(sf) =>
          val so = JObj(sf)
          def si(k: String) = so.get(k) match {
            case Some(JNum(v)) => v.toInt
            case _ => sys.error("bad span")
          }
          val kind = so.get("kind") match {
            case Some(JStr(v, _, _)) => v
            case _ => sys.error("bad kind")
          }
          (si("begin"), si("end"), kind)
        case _ => sys.error("bad span obj")
        }
        case _ => sys.error("bad spans")
      }
      Golden(str("conv_id"), int("turn_idx"), str("extractor"),
        str("extracted_text"), spans, str("error"),
        str("extractor_version"))
    }
  }
}

class GoldenE2ESpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("pipeline output equals committed goldens byte-for-byte " +
    "(per-turn text equality under stable turn ordering)") {
    import spark.implicits._
    val goldens = Golden.load()
    assert(goldens.size > 400)
    // shuffle input rows deterministically so ordering is earned, not
    // inherited
    val input = new scala.util.Random(13)
      .shuffle(GoldenData.inputTurns.toVector)
    val (out, _) = Job.run(spark, spark.createDataset(input), "e2e")
    val rows = out.collect().toVector

    // stable global order: collect() concatenates range partitions
    assert(rows.map(r => (r.conv_id, r.turn_idx)) ==
      rows.map(r => (r.conv_id, r.turn_idx))
        .sortBy(identity))

    // exactly one row per deduped (conv, turn)
    assert(rows.size == goldens.size)

    val byKey = rows.map(r => (r.conv_id, r.turn_idx) -> r).toMap
    var checked = 0
    for (g <- goldens) {
      val r = byKey((g.convId, g.turnIdx))
      assert(r.extractor == g.extractor, s"extractor @ ${g.convId}")
      assert(r.extracted_text == g.text,
        s"text mismatch @ ${g.convId}/${g.turnIdx}")
      assert(r.spans.map(s => (s.begin, s.end, s.kind)) == g.spans,
        s"spans mismatch @ ${g.convId}/${g.turnIdx}")
      assert(r.error == g.error, s"error @ ${g.convId}/${g.turnIdx}")
      assert(r.extractor_version == g.version)
      checked += 1
    }
    assert(checked == goldens.size) // 100% pass rate, no row skipped
  }

  test("lineage accounts for every row") {
    import spark.implicits._
    val input = spark.createDataset(GoldenData.inputTurns)
    val (out, acc) = Job.run(spark, input, "lineage-test")
    val n = out.count()
    val lin = Job.lineage(spark, acc).collect()
    // rows_in counts raw rows (incl. the duplicate edge-dup turn);
    // rows_out counts deduped extracted rows
    assert(lin.map(_.rows_in).sum == GoldenData.inputTurns.size)
    assert(lin.map(_.rows_out).sum == n)
    assert(lin.map(_.errors).sum >= 2) // bomb + bad pdf edge turns
    assert(lin.forall(_.extractor_version ==
      graft.schema.Versions.ExtractorVersion))
    assert(lin.forall(_.wall_ms >= 0))
  }
}

class DeterminismSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def key(r: ExtractedTurn) =
    (r.conv_id, r.turn_idx)

  test("identical output under different partitioning (N vs 4N cores " +
    "stand-in: partition-count independence)") {
    import spark.implicits._
    val input = GoldenData.inputTurns.toVector
    def runWith(parts: Int): Vector[ExtractedTurn] = {
      val ds = spark.createDataset(input).repartition(parts)
      val (out, _) = Job.run(spark, ds, s"det-$parts")
      out.collect().toVector
    }
    val a = runWith(1)
    val b = runWith(7)
    val c = runWith(32)
    assert(a == b)
    assert(b == c)
  }

  test("synth generator is partitioning-independent") {
    val a = SynthTranscripts.turns(spark, 30, partitions = 1).collect()
      .sortBy(t => (t.conv_id, t.turn_idx))
    val b = SynthTranscripts.turns(spark, 30, partitions = 11).collect()
      .sortBy(t => (t.conv_id, t.turn_idx))
    assert(a.toSeq == b.toSeq)
  }
}

class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("mega-conversation output correct through salted repartition") {
    import spark.implicits._
    val input = GoldenData.skewTurns
    val ds = Job.saltedRepartition(spark.createDataset(input), 8, 8)
    // salting spreads the 10^4-turn conversation over >1 partition
    val partSizes = ds.mapPartitions(it => Iterator(it.size)).collect()
    assert(partSizes.count(_ > 0) > 1)
    val (out, _) = Job.run(spark, ds, "skew")
    val rows = out.collect()
    assert(rows.length == input.size)
    // spot-check against direct per-row extraction
    val direct = input.map(t => (t.conv_id, t.turn_idx) ->
      Extractor.extract(t)).toMap
    for (r <- rows.take(500)) {
      val ex = direct((r.conv_id, r.turn_idx))
      assert(r.extracted_text == ex.extracted_text)
    }
    // global order maintained
    val keys = rows.map(r => (r.conv_id, r.turn_idx)).toVector
    assert(keys == keys.sortBy(identity))
  }
}

class CheckpointSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("incremental resume processes only new files, idempotent") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt")
      .toString
    val inDir = s"$base/in"
    val outDir = s"$base/out"
    val stateDir = s"$base/state"
    def writeBatch(name: String, convs: Range): Unit =
      spark.createDataset(convs.flatMap(c =>
          SynthTranscripts.genConv(42, c.toLong, 0, 0)).toSeq)
        .coalesce(1).write.parquet(s"$base/tmp-$name")
    // stage two input files
    writeBatch("a", 0 until 3)
    writeBatch("b", 3 until 6)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    new java.io.File(inDir).mkdirs()
    def promote(name: String): Unit = {
      val src = new java.io.File(s"$base/tmp-$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }
    promote("a"); promote("b")

    val n1 = Checkpoint.runIncremental(spark, inDir, outDir, stateDir,
      "run1")
    assert(n1 == 2)
    val count1 = Checkpoint.readCommitted(spark, outDir, stateDir).count()
    assert(count1 > 0)

    // resume with nothing new -> no-op
    assert(Checkpoint.runIncremental(spark, inDir, outDir, stateDir,
      "run2") == 0)
    assert(Checkpoint.readCommitted(spark, outDir, stateDir).count()
      == count1)

    // crash between output staging and manifest commit: wipe the
    // manifest (as if the commit never happened) and replay the same
    // run — the run-scoped overwrite must NOT duplicate output rows
    fs.delete(new org.apache.hadoop.fs.Path(stateDir, "manifest.txt"),
      false)
    assert(Checkpoint.runIncremental(spark, inDir, outDir, stateDir,
      "run1") == 2)
    assert(Checkpoint.readCommitted(spark, outDir, stateDir).count()
      == count1)

    // add a third file -> only it is processed, output appended
    writeBatch("c", 6 until 8)
    promote("c")
    assert(Checkpoint.runIncremental(spark, inDir, outDir, stateDir,
      "run3") == 1)
    val count2 = Checkpoint.readCommitted(spark, outDir, stateDir).count()
    val expected = (6 until 8).map(c =>
      SynthTranscripts.genConv(42, c.toLong, 0, 0).size).sum
    assert(count2 == count1 + expected)

    // an orphan (staged-but-uncommitted) run directory is invisible
    spark.range(0).write
      .parquet(s"$outDir/lineage/run=crashed-orphan")
    val runs = Checkpoint.readCommitted(spark, outDir, stateDir,
        "lineage")
      .select("run_id").distinct().collect().map(_.getString(0)).toSet
    assert(runs == Set("run1", "run3"))
    assert(Checkpoint.committedRuns(spark, stateDir)
      == Set("run1", "run3"))

    // replaying a committed runId with NO new input is a no-op (crash
    // after a successful commit must stay replay-safe) ...
    assert(Checkpoint.runIncremental(spark, inDir, outDir, stateDir,
      "run1") == 0)
    // ... but reusing a COMMITTED runId after new input lands must be
    // refused — the overwrite would destroy run1's published rows while
    // the manifest still marks its files processed
    writeBatch("d", 8 until 9)
    promote("d")
    intercept[IllegalArgumentException] {
      Checkpoint.runIncremental(spark, inDir, outDir, stateDir, "run1")
    }
    // and the refused attempt must not have touched committed output
    assert(Checkpoint.readCommitted(spark, outDir, stateDir).count()
      == count2)
  }
}
