package graft.sources

import graft.pipe.SparkTestSession
import graft.schema.Turn
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  /** Hostile payloads: embedded newlines (tool frames), quotes, commas,
    * backslashes, unicode, JSON-looking text.
    */
  private val turns = Seq(
    Turn("c1", 0, "user", "plain text", "", ts(86400000L)),
    Turn("c1", 1, "tool", "$ cat doc.txt\nline two\nexit_code: 0",
      "bash", ts(86401000L)),
    Turn("c2", 0, "assistant",
      "he said \"hi, you\" then \\escaped\\ a, b, c", "", ts(86402000L)),
    Turn("c2", 1, "user", "unicode: é 中文 русский \t tab", "",
      ts(86403000L)),
    Turn("c3", 0, "user", """{"looks":"like json","n":[1,2]}""", "",
      ts(86404000L)))

  private def sort(xs: Array[Turn]): Seq[Turn] =
    xs.toSeq.sortBy(t => (t.conv_id, t.turn_idx))

  test("JSONL round-trips hostile payloads byte-exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-src-json")
      .toString
    spark.createDataset(turns).write.mode("overwrite").json(s"$dir/t")
    val back = TranscriptSource.jsonl(spark, s"$dir/t").collect()
    assert(sort(back) == turns)
  }

  test("CSV (multiLine) round-trips hostile payloads byte-exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-src-csv")
      .toString
    TranscriptSource.writeCsv(spark.createDataset(turns), s"$dir/t")
    val back = TranscriptSource.csv(spark, s"$dir/t").collect()
    assert(sort(back) == turns)
  }

  test("CSV round-trips null fields as null, not empty string") {
    import spark.implicits._
    // null text/tool vs genuinely-empty tool: the writer must emit the
    // same U+0000 sentinel the reader maps back to null, or a null
    // round-trips as "" (the writer's default null representation is
    // the unquoted empty the reader no longer treats as null)
    val withNulls = Seq(
      Turn("c1", 0, "user", null, "", ts(86400000L)),
      Turn("c1", 1, "user", "text", null, ts(86401000L)),
      Turn("c2", 0, "user", "", "", ts(86402000L)))
    val dir = java.nio.file.Files.createTempDirectory("graft-src-null")
      .toString
    TranscriptSource.writeCsv(spark.createDataset(withNulls), s"$dir/t")
    val back = TranscriptSource.csv(spark, s"$dir/t").collect()
    assert(sort(back) == withNulls)
  }

  test("jsonlQuarantine: valid rows recovered byte-exactly, garbage " +
    "rejected with reasons, nothing lost or invented") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-src-q")
      .toString
    spark.createDataset(turns).write.mode("overwrite").json(s"$dir/t")
    val garbage = Seq(
      "{definitely not json",
      """{"turn_idx": 1, "role": "user", "text": "x", "tool": "",""" +
        """ "ts": "2024-01-01T00:00:01.000Z"}""", // missing conv_id
      """{"conv_id": "g", "role": "user", "text": "x", "tool": "",""" +
        """ "ts": "2024-01-01T00:00:01.000Z"}""", // missing turn_idx
      """{"conv_id": "g", "turn_idx": 1, "text": "x", "tool": "",""" +
        """ "ts": "2024-01-01T00:00:01.000Z"}""", // missing role
      """{"conv_id": "g", "turn_idx": 1, "role": "user",""" +
        """ "text": null, "tool": "", "ts":""" +
        """ "2024-01-01T00:00:01.000Z"}""") // null text
    spark.createDataset(garbage).coalesce(1).write.mode("append")
      .text(s"$dir/t")
    val (good, bad) = TranscriptSource.jsonlQuarantine(spark, s"$dir/t")
    assert(sort(good.collect()) == turns)
    val badRows = bad.collect().map(r => (r.getString(0), r.getString(1)))
    assert(badRows.length == 5, badRows.toSeq)
    // every quarantined line carries a reason and is one of the planted
    // garbage lines (categorization of unparseable-vs-missing-field may
    // legitimately differ by parser mode; the CONTRACT is the split)
    assert(badRows.forall { case (raw, reason) =>
      garbage.contains(raw) && reason != null && reason.nonEmpty
    }, badRows.toSeq)
  }

  test("explicit schema matches the Turn contract (no inference)") {
    val names = TranscriptSource.schema.fields.map(f =>
      (f.name, f.dataType.typeName)).toSeq
    assert(names == Seq(("conv_id", "string"), ("turn_idx", "integer"),
      ("role", "string"), ("text", "string"), ("tool", "string"),
      ("ts", "timestamp")))
  }
}
