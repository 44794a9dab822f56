package graft.functions

import graft.pipe.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtractExpressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def registered() = { GraftFunctions.register(spark); spark }

  test("SQL surface: extract_main_content over a view") {
    val s = registered()
    import s.implicits._
    Seq(
      ("c1", 0, "user", "hello   world\n\npar two", ""),
      ("c1", 1, "assistant",
        "<html><body><nav><a href='/'>x</a></nav><p>alpha beta gamma " +
          "delta epsilon zeta eta theta iota kappa lambda mu nu xi " +
          "omicron pi rho</p></body></html>", ""),
      ("c1", 2, "tool", "$ ls\nfile.txt\nexit_code: 0", "bash"))
      .toDF("conv_id", "turn_idx", "role", "text", "tool")
      .createOrReplaceTempView("turns_v")
    val rows = s.sql(
      """SELECT conv_id, turn_idx,
         extract_main_content(text, role, tool) AS ex
         FROM turns_v ORDER BY turn_idx""").collect()
    assert(rows(0).getStruct(2).getString(1) == "hello world\npar two")
    assert(rows(1).getStruct(2).getString(0) == "html")
    assert(rows(1).getStruct(2).getString(1).startsWith("alpha beta"))
    assert(rows(2).getStruct(2).getString(1) == "file.txt")
    // span fields accessible from SQL
    val n = s.sql(
      """SELECT sum(size(extract_main_content(text, role, tool).spans))
         FROM turns_v""").collect()(0).getLong(0)
    assert(n >= 4)
  }

  test("null text yields null struct; null role/tool tolerated") {
    val s = registered()
    import s.implicits._
    val df = Seq((Option.empty[String], Option.empty[String]),
      (Some("plain words"), None))
      .toDF("text", "tool")
    df.createOrReplaceTempView("nulls_v")
    val out = s.sql(
      """SELECT extract_main_content(text, CAST(NULL AS STRING), tool)
         AS ex FROM nulls_v""").collect()
    assert(out.exists(_.isNullAt(0)))
    assert(out.exists(r => !r.isNullAt(0) &&
      r.getStruct(0).getString(1) == "plain words"))
  }

  test("column API via call_function") {
    val s = registered()
    import s.implicits._
    val df = Seq(("x y  z", "user", "")).toDF("text", "role", "tool")
    val out = df.select(GraftFunctions.extract_main_content($"text",
      $"role", $"tool").getField("extracted_text").as("t"))
      .collect()(0).getString(0)
    assert(out == "x y z")
  }

  test("stays inside whole-stage codegen") {
    val s = registered()
    val df = s.range(2)
      .selectExpr("concat('word w', id) AS text", "'user' AS role",
        "'' AS tool")
      .selectExpr("extract_main_content(text, role, tool) AS ex")
    val plan = df.queryExecution.executedPlan.toString
    // '*' prefixes mark operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project"),
      s"expected codegen in plan:\n$plan")
    // prove the generated code actually compiles: forbid silent
    // interpreter fallback while collecting
    val prev = s.conf.get("spark.sql.codegen.fallback", "true")
    s.conf.set("spark.sql.codegen.fallback", "false")
    try assert(df.collect().map(_.getStruct(0).getString(1)).sorted.toSeq ==
      Seq("word w0", "word w1"))
    finally s.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("op functions registered for spark.sql users") {
    val s = spark
    GraftOpFunctions.register(s)
    import s.implicits._
    Seq((1L, "email me at a@b.co about the the the offer"))
      .toDF("id", "text").createOrReplaceTempView("op_v")
    val r = s.sql(
      """SELECT graft_redact_pii(text) AS red,
               graft_quality(text) AS q,
               graft_lang_id(text) AS lang,
               graft_top_token_ratio(text) AS tt,
               graft_fingerprint(text) AS fp,
               graft_sample_bucket(id) AS b
         FROM op_v""").collect()(0)
    assert(r.getString(0) == "email me at <EMAIL> about the the the offer")
    assert(r.getString(2) == "en")
    assert(r.getDouble(3) == 0.3333) // 'the' x3 of 9 tokens
    assert(r.getString(5).length == 2)
    val cos = s.sql(
      "SELECT graft_cosine(array(1.0, 0.0), array(1.0, 0.0)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("graft_media_content decodes real BMP/WAV content; null for " +
    "undecodable formats") {
    val s = spark
    GraftOpFunctions.register(s)
    import s.implicits._
    import graft.ops.Multimodal
    s.range(6).map(id => (id, Multimodal.synthContentContainer(id)))
      .toDF("id", "payload").createOrReplaceTempView("mc_v")
    val rows = s.sql(
      """SELECT id, graft_media_content(payload).content_hash AS h,
               size(graft_media_content(payload).embedding) AS d
         FROM mc_v ORDER BY id""").collect()
    for (r <- rows) {
      val id = r.getLong(0)
      val exp =
        if (id % 2 == 0) Multimodal.decodeBmpContent(
          Multimodal.synthContentContainer(id)).get._1
        else Multimodal.decodeWavContent(
          Multimodal.synthContentContainer(id)).get._1
      assert(r.getLong(1) == exp, id)
      assert(r.getInt(2) == 8, id)
    }
    // a png (no real content decoder) yields an honest null
    val pngRow = Seq(Tuple1(Multimodal.synthContainer(0L))) // id 0 = png
      .toDF("p")
    pngRow.createOrReplaceTempView("mc_png")
    assert(s.sql("SELECT graft_media_content(p) FROM mc_png")
      .collect()(0).isNullAt(0))
  }

  test("graft_media_meta(non_binary) is rejected at analysis time") {
    val s = spark
    GraftOpFunctions.register(s)
    // a STRING argument must fail analysis with a clean type error,
    // not a ClassCastException inside generated code at execution
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      s.sql("SELECT graft_media_meta('not bytes')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary"), e.getMessage)
  }
}
