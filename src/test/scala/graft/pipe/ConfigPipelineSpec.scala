package graft.pipe

import graft.synth.GoldenData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConfigPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val config =
    """[
      {"step": "extract", "config": {"ordered": false}},
      {"step": "filter", "config": {"expr": "extracted_text <> ''"}},
      {"step": "quality_score",
       "config": {"col": "extracted_text", "out": "quality"}},
      {"step": "dedupe_exact",
       "config": {"key": "extracted_text",
                  "order": ["conv_id", "turn_idx"], "out": "dup_rank"}},
      {"step": "filter",
       "config": {"expr": "dup_rank = 1 AND quality >= 0.5"}},
      {"step": "agg",
       "config": {"group": ["extractor"],
                  "exprs": ["count(1) AS kept",
        "sum(cast(round(quality * 10, 0) AS long)) AS sum_q10"]}}
    ]"""

  test("config-assembled pipeline equals the hand-written one") {
    import spark.implicits._
    val turns = spark.createDataset(GoldenData.inputTurns)

    val fromConfig = ConfigPipeline.run(spark, turns, config, "cfg")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

    // hand-written equivalent (the x_pipeline_e2e shape)
    val (out, _) = Job.run(spark, turns, "wired", orderOutput = false)
    val scored = out.toDF()
      .filter($"extracted_text" =!= "")
      .withColumn("quality",
        graft.ops.TextStats.qualityScore($"extracted_text"))
      .withColumn("dup_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5($"extracted_text"))
          .orderBy($"conv_id", $"turn_idx")))
    val wired = scored.filter($"dup_rank" === 1 && $"quality" >= 0.5)
      .groupBy($"extractor")
      .agg(count(lit(1)).as("kept"),
        sum(round($"quality" * 10, 0).cast("long")).as("sum_q10"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

    assert(fromConfig == wired && fromConfig.nonEmpty)
  }

  test("select and with_column steps compose") {
    import spark.implicits._
    val turns = spark.createDataset(GoldenData.inputTurns)
    val cfg =
      """[{"step": "extract", "config": {"ordered": false}},
          {"step": "with_column",
           "config": {"name": "nc", "expr": "length(extracted_text)"}},
          {"step": "select", "config": {"cols": ["conv_id", "nc"]}}]"""
    val df = ConfigPipeline.run(spark, turns, cfg, "cfg2")
    assert(df.columns.toSeq == Seq("conv_id", "nc"))
    assert(df.count() == Job.dedupe(spark, turns).count())
  }

  test("ensemble extract step from config") {
    import spark.implicits._
    val turns = spark.createDataset(GoldenData.inputTurns)
    val cfg =
      """[{"step": "extract",
           "config": {"ordered": false,
             "ensemble": [{"type": "sniffed", "weight": 1.0},
                          {"type": "plain", "weight": 0.5}]}},
          {"step": "agg",
           "config": {"group": ["extractor"],
                      "exprs": ["count(1) AS n"]}}]"""
    val counts = ConfigPipeline.run(spark, turns, cfg, "ens")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the boilerplate-only edge turn now lands on plain instead of
    // empty html output; overall extractor mix still dominated by the
    // sniffed routes
    assert(counts.values.sum == Job.dedupe(spark, turns).count())
    assert(counts.contains("plain") && counts.contains("html"))
  }

  test("runOps: corpus steps compose over a plain table (dedupe_near " +
    "keeps cluster keepers; lang_id/redact attach frozen-spec columns)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today y"),
      (3L, "completely different words in this other document here"))
      .toDF("id", "text")
    val out = ConfigPipeline.runOps(spark, docs,
      """[
        {"step": "dedupe_near",
         "config": {"id": "id", "text": "text", "threshold": 0.8}},
        {"step": "lang_id", "config": {"col": "text"}},
        {"step": "redact", "config": {"col": "text"}},
        {"step": "select", "config": {"cols": ["id", "lang_pred"]}}
      ]""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    // 1 and 2 are near-dups -> keeper is min id 1; 3 survives
    assert(out == Seq((1L, "en"), (3L, "en")), out)
    // 'extract' is rejected outside the turn pipeline
    val e = intercept[ConfigPipeline.ConfigError](
      ConfigPipeline.runOps(spark, docs, """[{"step": "extract"}]"""))
    assert(e.getMessage.contains("only valid as the first step"),
      e.getMessage)
    // and the unknown-step hint from runOps does NOT advertise extract
    val e2 = intercept[ConfigPipeline.ConfigError](
      ConfigPipeline.runOps(spark, docs, """[{"step": "nope"}]"""))
    assert(!e2.getMessage.contains("extract"), e2.getMessage)
    // non-integral id columns are rejected with a clear ConfigError
    // (a string id would cast to null; a float id can collide)
    val strIds = Seq(("a", "some text here")).toDF("id", "text")
    val e3 = intercept[ConfigPipeline.ConfigError](
      ConfigPipeline.runOps(spark, strIds,
        """[{"step": "dedupe_near", "config": {"id": "id",
             "text": "text"}}]"""))
    assert(e3.getMessage.contains("integral"), e3.getMessage)
  }

  test("runOps: media steps compose — media_features decodes content " +
    "for real, dedupe_media marks content twins, ann_topk (lsh) " +
    "recovers a planted twin from config alone") {
    import spark.implicits._
    val media = (0L until 12L).flatMap { id =>
      val base = (id, "binary",
        graft.ops.Multimodal.synthContentContainer(id))
      if (id % 3 == 0)
        Seq(base, (id + 1000L, "binary",
          graft.ops.Multimodal.synthContentTwin(id)))
      else Seq(base)
    }.toDF("media_id", "kind", "payload")
    val deduped = ConfigPipeline.runOps(spark, media,
      """[
        {"step": "media_features",
         "config": {"id": "media_id", "payload": "payload",
                    "kind": "kind"}},
        {"step": "dedupe_media", "config": {}},
        {"step": "select", "config": {"cols": ["media_id", "is_dup"]}}
      ]""").collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    for (id <- 0L until 12L)
      assert(deduped(id) == (id % 3 == 0), s"id=$id")
    // header mode carries no content columns at all
    val hdr = ConfigPipeline.runOps(spark, media,
      """[{"step": "media_features",
           "config": {"id": "media_id", "payload": "payload",
                      "mode": "header"}}]""")
    assert(!hdr.columns.contains("content_hash"))
    assert(hdr.columns.contains("width"))
    // ann_topk from config: twins (id >= 1000) as queries must
    // retrieve exactly their base partner at rank 1 — on BOTH indexed
    // modes (lsh and ivf resolve from the same registry entry)
    for (mode <- Seq("lsh", "ivf")) {
      val hits = ConfigPipeline.runOps(spark, media,
        s"""[
          {"step": "media_features",
           "config": {"id": "media_id", "payload": "payload"}},
          {"step": "ann_topk",
           "config": {"id": "media_id", "vec": "embedding",
                      "queries_expr": "media_id >= 1000",
                      "k": 1, "dim": 8, "mode": "$mode"}}
        ]""").collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      for (id <- 0L until 12L if id % 3 == 0)
        assert(hits(id + 1000L) == id, s"twin of $id ($mode)")
    }
    // non-binary payload and bad mode rejected with clear errors
    val e = intercept[ConfigPipeline.ConfigError](
      ConfigPipeline.runOps(spark,
        Seq((1L, "nope")).toDF("media_id", "payload"),
        """[{"step": "media_features",
             "config": {"payload": "payload"}}]"""))
    assert(e.getMessage.contains("binary"), e.getMessage)
    val e2 = intercept[ConfigPipeline.ConfigError](
      ConfigPipeline.runOps(spark, media,
        """[{"step": "media_features",
             "config": {"payload": "payload", "mode": "wat"}}]"""))
    assert(e2.getMessage.contains("content"), e2.getMessage)
  }

  test("runOps: retrieval steps equal their direct op calls " +
    "(bm25_topk, source_balance filter semantics, lm_score join)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana", "A"), (2L, "apple apple banana", "A"),
      (3L, "cherry", "A"), (4L, "apple cherry", "B")
    ).toDF("doc_id", "text", "source")
    // bm25_topk from config == Retrieval.bm25TopK directly
    val viaCfg = ConfigPipeline.runOps(spark, docs,
      """[{"step": "bm25_topk",
           "config": {"id": "doc_id", "text": "text",
                      "queries_expr": "doc_id = 1",
                      "terms_expr": "array('apple')", "k": 3}}]""")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val direct = graft.ops.Retrieval.bm25TopK(spark,
      docs.select($"doc_id", $"text"),
      Seq((1L, Seq("apple"))).toDF("qid", "terms"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(viaCfg == direct && viaCfg.nonEmpty)
    // source_balance is a FILTER: schema intact, kept ids match the
    // op's own keep set
    val balanced = ConfigPipeline.runOps(spark, docs,
      """[{"step": "source_balance",
           "config": {"id": "doc_id", "text": "text",
                      "source": "source"}}]""")
    assert(balanced.columns.toSeq == docs.columns.toSeq)
    val keptIds = balanced.collect().map(_.getLong(0)).toSet
    val opIds = graft.ops.Retrieval.temperatureKept(spark,
      docs.select($"source", $"doc_id", $"text"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(keptIds == opIds && keptIds.nonEmpty)
    // lm_score joins the score on; single-token docs get null
    val scored = ConfigPipeline.runOps(spark, docs,
      """[{"step": "lm_score",
           "config": {"id": "doc_id", "text": "text",
                      "out": "nll"}}]""")
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[java.lang.Long]("nll")))).toMap
    assert(scored(3L).isEmpty && scored(1L).nonEmpty)
    // decontaminate from config: the bench bigram "apple banana"
    // appears in docs 1 and 2 (and nowhere else)
    val deconRows = ConfigPipeline.runOps(spark,
      docs.select($"doc_id", $"text")
        .union(Seq((100L, "apple banana")).toDF("doc_id", "text")),
      """[{"step": "decontaminate",
           "config": {"bench_expr": "doc_id >= 100", "n": 2}}]""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(deconRows == Map(1L -> 1L, 2L -> 1L))
  }

  test("runOps: chunk and pack steps equal their direct op calls") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(70)("w").mkString(" ")),
      (2L, "a b c"), (3L, "")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val chunkCfg = ConfigPipeline.runOps(spark, docs,
      """[{"step": "chunk", "config": {"size": 16, "stride": 8}}]""")
    val chunkDirect = graft.ops.Retrieval.chunk(spark, docs, 16, 8)
    assert(rows(chunkCfg) == rows(chunkDirect) && chunkCfg.count() > 0)
    val packCfg = ConfigPipeline.runOps(spark, docs,
      """[{"step": "pack", "config": {"context_len": 20}}]""")
    val packDirect = graft.ops.Retrieval.pack(spark, docs, 20)
    assert(rows(packCfg) == rows(packDirect))
    // the empty doc is dropped, the others packed
    assert(packCfg.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("runOps: dedupe_lines step equals the direct LineDedup call") {
    import spark.implicits._
    val docs = Seq(
      (1L, "footer\nkeep one"), (2L, "footer\nkeep two"),
      (3L, "footer\nkeep three"), (4L, "clean doc")
    ).toDF("id", "body")
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val viaCfg = ConfigPipeline.runOps(spark, docs,
      """[{"step": "dedupe_lines",
           "config": {"id": "id", "text": "body", "min_docs": 3}}]""")
    val direct = graft.ops.LineDedup.dedupLines(spark,
      docs.select($"id".as("doc_id"), $"body".as("text")), 3)
    assert(rows(viaCfg) == rows(direct) && viaCfg.count() == 4)
    // the shared footer was actually removed via the config path
    assert(viaCfg.filter($"n_removed" === 1).count() == 3)
  }

  test("runOps: dedupe_substr step equals the direct ExactSubstr call") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha one two three four five six omega"),
      (2L, "beta one two three four five six"),
      (3L, "gamma delta epsilon")
    ).toDF("id", "body")
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val viaCfg = ConfigPipeline.runOps(spark, docs,
      """[{"step": "dedupe_substr",
           "config": {"id": "id", "text": "body", "window": 6}}]""")
    val direct = graft.ops.ExactSubstr.dedupSubstrings(spark,
      docs.select($"id".as("doc_id"), $"body".as("text")), 6)
    assert(rows(viaCfg) == rows(direct) && viaCfg.count() == 3)
    // the shared 6-token span was actually stripped via the config path
    assert(viaCfg.filter($"n_removed" === 6).count() == 2)
  }

  test("runOps: decontaminate_bloom equals the direct op call and " +
    "flags exactly the contaminated doc") {
    import spark.implicits._
    val df = Seq(
      (1L, "xx yy zz aa bb"), // contains the bench 3-gram "yy zz aa"
      (2L, "pp qq rr ss"),
      (100L, "yy zz aa")
    ).toDF("id", "body")
    def rows(d: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      d.collect().map(_.toSeq).toSet
    val viaCfg = ConfigPipeline.runOps(spark, df,
      """[{"step": "decontaminate_bloom",
           "config": {"id": "id", "text": "body",
                      "bench_expr": "id >= 100",
                      "n": 3, "m": 1024, "k": 7}}]""")
    val direct = graft.ops.Retrieval.decontaminateBloom(spark,
      df.filter($"id" < 100)
        .select($"id".as("doc_id"), $"body".as("text")),
      df.filter($"id" >= 100).select($"body".as("text")),
      3, 1024, 7)
    assert(rows(viaCfg) == rows(direct))
    assert(rows(viaCfg) == Set(Seq(1L, 1L)))
  }

  test("runOps: url_normalize step attaches URL-1 columns, then " +
    "dedupe_exact over url_norm collapses raw-string variants") {
    import spark.implicits._
    val df = Seq(
      (1L, "http://Example.com:80/a?utm_s=1"),
      (2L, "HTTP://example.COM/a"),
      (3L, "http://example.com/b")).toDF("id", "u")
    val out = ConfigPipeline.runOps(spark, df,
      """[{"step": "url_normalize", "config": {"url": "u"}}]""")
    assert(out.columns.toSet ==
      Set("id", "u", "url_norm", "host"))
    assert(out.select($"host").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("example.com"))
    assert(out.select($"url_norm").distinct().count() == 2)
  }

  test("bad configs are rejected with a clear error") {
    import spark.implicits._
    val turns = spark.createDataset(GoldenData.inputTurns.take(2))
    def fails(cfg: String, needle: String): Unit = {
      val e = intercept[ConfigPipeline.ConfigError](
        ConfigPipeline.run(spark, turns, cfg, "bad"))
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    fails("""{"step": "extract"}""", "must be an array")
    fails("""[{"step": "filter", "config": {"expr": "1=1"}}]""",
      "first step must be 'extract'")
    fails("""[{"step": "extract"}, {"step": "nope"}]""", "unknown step")
    fails("""[{"step": "extract"}, {"step": "filter"}]""",
      "missing string field 'expr'")
  }
}
