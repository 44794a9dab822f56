package graft.pipe

import graft.schema.Turn
import graft.text.Json
import graft.text.Json._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven pipeline assembly — the reference builds its step DAG
  * from a JSON list with per-step config (vkit/pipeline/interface.py:
  * 133-148, PipelineStepFactory) and we do the same over DataFrames:
  *
  *   [{"step": "extract", "config": {"ordered": false}},
  *    {"step": "filter",  "config": {"expr": "extracted_text <> ''"}},
  *    {"step": "quality_score", "config": {"out": "quality"}},
  *    {"step": "dedupe_exact",  "config": {"key": "extracted_text",
  *                                "order": ["conv_id", "turn_idx"]}},
  *    ...]
  *
  * Each registry entry maps its JSON config to a DataFrame -> DataFrame
  * transform; the composed pipeline stays fully declarative (one
  * Catalyst plan — config assembly adds NO extra stages or shuffles vs
  * the hand-written equivalent). Filters/aggregations use ANSI SQL
  * expression strings (Spark `expr`), so a config can express anything
  * the DataFrame API can, while frozen-spec transforms (QUAL-1 scoring)
  * are named steps that reuse the spec implementation.
  */
object ConfigPipeline {

  final class ConfigError(msg: String) extends Exception(msg)

  private def str(o: JObj, k: String, default: String = null): String =
    o.get(k) match {
      case Some(JStr(v, _, _)) => v
      case None if default != null => default
      case _ => throw new ConfigError(s"missing string field '$k'")
    }

  private def strs(o: JObj, k: String): Seq[String] = o.get(k) match {
    case Some(JArr(items)) => items.map {
      case JStr(v, _, _) => v
      case _ => throw new ConfigError(s"'$k' must be an array of strings")
    }
    case _ => throw new ConfigError(s"missing array field '$k'")
  }

  private def bool(o: JObj, k: String, default: Boolean): Boolean =
    o.get(k) match {
      case Some(JBool(v)) => v
      case None => default
      case _ => throw new ConfigError(s"'$k' must be a boolean")
    }

  private def num(o: JObj, k: String, default: Double): Double =
    o.get(k) match {
      case Some(JNum(v)) => v
      case None => default
      case _ => throw new ConfigError(s"'$k' must be a number")
    }

  /** Registered transform steps (everything after the extract source). */
  val registry: Map[String, (SparkSession, JObj) => DataFrame => DataFrame] =
    Map(
      // row filter by ANSI SQL predicate
      "filter" -> { (_, cfg) =>
        val e = str(cfg, "expr")
        df => df.filter(expr(e))
      },
      // generic computed column by ANSI SQL expression
      "with_column" -> { (_, cfg) =>
        val name = str(cfg, "name")
        val e = str(cfg, "expr")
        df => df.withColumn(name, expr(e))
      },
      // frozen QUAL-1 quality score over a text column. Once: config
      // pipelines routinely follow this step with a filter on the
      // score, and without the barrier predicate pushdown duplicates
      // the whole QUAL-1 expression below upstream exchanges (guide
      // §4.4; see graft.functions.Once)
      "quality_score" -> { (_, cfg) =>
        val colName = str(cfg, "col", "extracted_text")
        val out = str(cfg, "out", "quality")
        df => df.withColumn(out, graft.functions.OnceOps.once(
          graft.ops.TextStats.qualityScore(col(colName))))
      },
      // exact-dup rank over md5(key), deterministic winner by `order` —
      // ranked on a slim (hash, order) projection so the payload column
      // never enters the window exchange (Job.rankDuplicates).
      // CONFIG CONTRACT: `order` must uniquely identify a row within
      // each key group (use the pipeline primary key, e.g.
      // ["conv_id", "turn_idx"]); a config whose order columns admit
      // duplicate tuples fails at runtime with a clear
      // rankDuplicates error rather than silently multiplying rows
      "dedupe_exact" -> { (_, cfg) =>
        val key = str(cfg, "key", "extracted_text")
        val out = str(cfg, "out", "dup_rank")
        val order = strs(cfg, "order")
        df => Job.rankDuplicates(df, key, order, out)
      },
      // frozen LANGID-4 language classification over a text column
      "lang_id" -> { (_, cfg) =>
        val colName = str(cfg, "col", "extracted_text")
        val out = str(cfg, "out", "lang_pred")
        df => df.withColumn(out, graft.ops.Lexicon.langId(col(colName)))
      },
      // frozen REDACT-1 PII scrub over a text column
      "redact" -> { (_, cfg) =>
        val colName = str(cfg, "col", "extracted_text")
        val out = str(cfg, "out", "clean_text")
        df => df.withColumn(out,
          graft.ops.TextStats.redactPII(col(colName)))
      },
      // near-duplicate removal: MinHash-LSH pairs at `threshold` ->
      // connected components -> keep only each cluster's canonical
      // keeper (min id). `id` must be a LONG (castable) unique key;
      // the same count-capped, candidate-only-verify engine as the
      // t_dedup_* queries, so config pipelines inherit its scale shape
      "dedupe_near" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "id")
        val textCol = str(cfg, "text", "extracted_text")
        val threshold = num(cfg, "threshold", 0.9)
        df => {
          import s.implicits._
          // the id must be integral BEFORE the long cast: a string id
          // would cast to null (opaque runtime failure) and a float id
          // can collide after truncation, silently corrupting the
          // keeper graph
          val idType = df.schema.fields.find(_.name == idCol)
            .getOrElse(throw new ConfigError(
              s"dedupe_near: no column '$idCol'")).dataType
          idType match {
            case org.apache.spark.sql.types.LongType |
              org.apache.spark.sql.types.IntegerType |
              org.apache.spark.sql.types.ShortType => ()
            case other => throw new ConfigError(
              s"dedupe_near: '$idCol' must be an integral column, " +
                s"got ${other.catalogString}")
          }
          val corpus = df
            .select(col(idCol).cast("long").as("id"),
              col(textCol).as("text")).as[(Long, String)]
          val pairs = graft.ops.MinHashDedup.nearDuplicates(s, corpus,
            threshold = threshold)
          val keep = graft.ops.Clusters.keepers(s, pairs,
            corpus.toDF("id", "text").select($"id"))
            .filter($"is_keeper").select($"id".as(idCol))
          df.join(keep, Seq(idCol), "left_semi")
        }
      },
      // MEDIA-1..5 feature extraction over a binary payload column:
      // mode "content" (header parse + real BMP/WAV/PNG/GIF content
      // decode, stub otherwise) or "header" (metadata only — never
      // attempts content decode; the 100 TB metadata-scan shape)
      "media_features" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "media_id")
        val payloadCol = str(cfg, "payload", "payload")
        val kindCol = str(cfg, "kind", "")
        val mode = str(cfg, "mode", "content")
        if (mode != "content" && mode != "header")
          throw new ConfigError(
            s"media_features: mode must be 'content' or 'header', got '$mode'")
        df => {
          import s.implicits._
          val payType = df.schema.fields.find(_.name == payloadCol)
            .getOrElse(throw new ConfigError(
              s"media_features: no column '$payloadCol'")).dataType
          if (payType != org.apache.spark.sql.types.BinaryType)
            throw new ConfigError(
              s"media_features: '$payloadCol' must be binary, got " +
                payType.catalogString)
          val kindExpr =
            if (kindCol.isEmpty) lit("binary") else col(kindCol)
          val rows = df.select(col(idCol).cast("long").as("media_id"),
            kindExpr.as("kind"), col(payloadCol).as("payload"))
            .as[graft.ops.Multimodal.MediaRow]
          if (mode == "header")
            graft.ops.Multimodal.extractHeaders(s, rows).toDF()
          else graft.ops.Multimodal.extractFeatures(s, rows).toDF()
        }
      },
      // content-based media dedup marking: window count over a content
      // hash column (composes after media_features — the slim (id,
      // hash) projection is what moves through the window exchange)
      "dedupe_media" -> { (_, cfg) =>
        val hashCol = str(cfg, "hash", "content_hash")
        val out = str(cfg, "out", "is_dup")
        df => {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col(hashCol))
          df.withColumn(out, count(lit(1)).over(w) > 1)
        }
      },
      // ANN top-k retrieval within one table: rows satisfying
      // `queries_expr` are the query set, the rest the corpus; modes
      // lsh (scale path) / ivf / brute (oracle baseline). Output is
      // (qid, rank, id).
      "ann_topk" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "media_id")
        val vecCol = str(cfg, "vec", "embedding")
        val qExpr = str(cfg, "queries_expr")
        val k = num(cfg, "k", 1).toInt
        val dim = num(cfg, "dim", 8).toInt
        val mode = str(cfg, "mode", "lsh")
        df => {
          val corpus = df.filter(!expr(qExpr))
            .select(col(idCol).cast("long").as("id"),
              col(vecCol).as("vec"))
          val queries = df.filter(expr(qExpr))
            .select(col(idCol).cast("long").as("qid"),
              col(vecCol).as("qvec"))
          mode match {
            case "lsh" => graft.ops.Ann.lshTopK(s, corpus, queries, k, dim)
            case "ivf" => graft.ops.Ann.ivfTopK(s, corpus, queries, k, dim)
            case "brute" =>
              graft.ops.Ann.bruteForceTopK(s, corpus, queries, k)
            case other =>
              throw new ConfigError(s"ann_topk: unknown mode '$other'")
          }
        }
      },
      // benchmark decontamination within one table: rows satisfying
      // `bench_expr` are the benchmark set, the rest the corpus.
      // Output is (doc_id, n_shared) for contaminated corpus docs —
      // the GPT-3 13-gram rule from config
      "decontaminate" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "doc_id")
        val textCol = str(cfg, "text", "text")
        val benchExpr = str(cfg, "bench_expr")
        val n = num(cfg, "n", 13).toInt
        df => {
          val corpus = df.filter(!expr(benchExpr))
            .select(col(idCol).cast("long").as("doc_id"),
              col(textCol).as("text"))
          val bench = df.filter(expr(benchExpr))
            .select(col(textCol).as("text"))
          graft.ops.Retrieval.decontaminate(s, corpus, bench, n)
        }
      },
      // URL-1 canonicalization: attaches url_norm + host (the
      // pre-content dedup tier; dedupe_exact over url_norm downstream)
      "url_normalize" -> { (_, cfg) =>
        val urlCol = str(cfg, "url", "url")
        df => df
          .withColumn("url_norm",
            graft.ops.UrlOps.normalize(col(urlCol)))
          .withColumn("host", graft.ops.UrlOps.host(col(urlCol)))
      },
      // bloom-path decontamination: same contract as `decontaminate`
      // but the bench set ships as a BLOOM-1 blob literal — zero
      // corpus shuffle (m/k per graft.functions.BloomOps sizing)
      "decontaminate_bloom" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "doc_id")
        val textCol = str(cfg, "text", "text")
        val benchExpr = str(cfg, "bench_expr")
        val n = num(cfg, "n", 13).toInt
        val m = num(cfg, "m", 32768).toInt
        val k = num(cfg, "k", 7).toInt
        df => {
          val corpus = df.filter(!expr(benchExpr))
            .select(col(idCol).cast("long").as("doc_id"),
              col(textCol).as("text"))
          val bench = df.filter(expr(benchExpr))
            .select(col(textCol).as("text"))
          graft.ops.Retrieval.decontaminateBloom(
            s, corpus, bench, n, m, k)
        }
      },
      // BM25 top-k retrieval: rows satisfying `queries_expr` contribute
      // query term sets via `terms_expr` (an SQL array<string>
      // expression); the corpus is ALL rows. Output (qid, rn, doc_id,
      // score_scaled).
      "bm25_topk" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "doc_id")
        val textCol = str(cfg, "text", "text")
        val qExpr = str(cfg, "queries_expr")
        val termsExpr = str(cfg, "terms_expr")
        val k = num(cfg, "k", 5).toInt
        df => {
          val corpus = df.select(col(idCol).cast("long").as("doc_id"),
            col(textCol).as("text"))
          val queries = df.filter(expr(qExpr))
            .select(col(idCol).cast("long").as("qid"),
              expr(termsExpr).as("terms"))
          graft.ops.Retrieval.bm25TopK(s, corpus, queries, k)
        }
      },
      // temperature source balancing as a FILTER step: only the
      // count^alpha budgeted keeps survive, original columns intact
      "source_balance" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "doc_id")
        val textCol = str(cfg, "text", "text")
        val sourceCol = str(cfg, "source", "source")
        val alpha = num(cfg, "alpha", 0.5)
        df => {
          val corpus = df.select(col(sourceCol).as("source"),
            col(idCol).cast("long").as("doc_id"),
            col(textCol).as("text"))
          val keep = graft.ops.Retrieval
            .temperatureKept(s, corpus, alpha)
            .select(col("doc_id").as(idCol))
          df.join(keep, Seq(idCol), "left_semi")
        }
      },
      // bigram-LM quality score joined back as a column (null for
      // docs with no bigram)
      "lm_score" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "doc_id")
        val textCol = str(cfg, "text", "text")
        val out = str(cfg, "out", "nll_mean_scaled")
        df => {
          val corpus = df.select(col(idCol).cast("long").as("doc_id"),
            col(textCol).as("text"))
          val scores = graft.ops.Retrieval.lmScore(s, corpus)
            .select(col("doc_id").as(idCol),
              col("nll_mean_scaled").as(out))
          df.join(scores, Seq(idCol), "left")
        }
      },
      // context-length chunking (the t_chunk operator as a step)
      "chunk" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "doc_id")
        val textCol = str(cfg, "text", "text")
        val size = num(cfg, "size", 32).toInt
        val stride = num(cfg, "stride", 24).toInt
        df => graft.ops.Retrieval.chunk(s,
          df.select(col(idCol).cast("long").as("doc_id"),
            col(textCol).as("text")), size, stride)
      },
      // sequence packing (the t_pack operator as a step)
      "pack" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "doc_id")
        val textCol = str(cfg, "text", "text")
        val ctx = num(cfg, "context_len", 128).toInt
        df => graft.ops.Retrieval.pack(s,
          df.select(col(idCol).cast("long").as("doc_id"),
            col(textCol).as("text")), ctx)
      },
      // C4/RefinedWeb line-level boilerplate removal: lines recurring
      // in >= min_docs distinct docs dropped corpus-wide, each doc
      // reassembled from its survivors (the t_dedup_lines operator)
      "dedupe_lines" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "doc_id")
        val textCol = str(cfg, "text", "text")
        val minDocs = num(cfg, "min_docs", 3).toInt
        df => graft.ops.LineDedup.dedupLines(s,
          df.select(col(idCol).cast("long").as("doc_id"),
            col(textCol).as("text")), minDocs)
      },
      // exact-substring dedup (Lee et al. ExactSubstr): any `window`-
      // token span occurring >= 2 times corpus-wide is stripped from
      // every doc (the t_dedup_substr operator)
      "dedupe_substr" -> { (s, cfg) =>
        val idCol = str(cfg, "id", "doc_id")
        val textCol = str(cfg, "text", "text")
        val w = num(cfg, "window", 50).toInt
        df => graft.ops.ExactSubstr.dedupSubstrings(s,
          df.select(col(idCol).cast("long").as("doc_id"),
            col(textCol).as("text")), w)
      },
      // group-by aggregation with SQL aggregate expressions
      "agg" -> { (_, cfg) =>
        val group = strs(cfg, "group").map(col)
        val exprs = strs(cfg, "exprs").map(expr)
        df => df.groupBy(group: _*).agg(exprs.head, exprs.tail: _*)
      },
      // column projection
      "select" -> { (_, cfg) =>
        val cols = strs(cfg, "cols").map(col)
        df => df.select(cols: _*)
      })

  private def parseSteps(config: String): Seq[(String, JObj)] =
    Json.parse(config) match {
      case JArr(items) => items.map {
        case o @ JObj(_) =>
          val name = str(o, "step")
          val cfg = o.get("config") match {
            case Some(c @ JObj(_)) => c
            case None => JObj(Vector.empty)
            case _ => throw new ConfigError("'config' must be an object")
          }
          (name, cfg)
        case _ => throw new ConfigError("each step must be an object")
      }
      case _ => throw new ConfigError("pipeline config must be an array")
    }

  private def applySteps(spark: SparkSession, input: DataFrame,
      steps: Seq[(String, JObj)], alsoKnown: String = ""): DataFrame =
    steps.foldLeft(input) { case (df, (name, cfg)) =>
      val stage = registry.getOrElse(name, throw new ConfigError(
        s"unknown step '$name'; known: $alsoKnown" +
          registry.keys.toSeq.sorted.mkString(", ")))
      stage(spark, cfg)(df)
    }

  /** Fold registry steps over an ARBITRARY input table — the config
    * surface for document-corpus pipelines (dedupe_near / quality /
    * lang_id / redact / ...) that do not start from transcript
    * extraction. Same registry, same one-plan composition.
    */
  def runOps(spark: SparkSession, input: DataFrame,
      config: String): DataFrame = {
    val steps = parseSteps(config)
    steps.find(_._1 == "extract").foreach { _ =>
      throw new ConfigError(
        "'extract' is only valid as the first step of run() over turns")
    }
    applySteps(spark, input, steps)
  }

  /** Parse a pipeline config; first step must be "extract" (the source:
    * Job.run over the input turns), the rest come from the registry.
    */
  def run(spark: SparkSession, turns: Dataset[Turn], config: String,
      runId: String): DataFrame = {
    val steps = parseSteps(config)
    if (steps.isEmpty || steps.head._1 != "extract")
      throw new ConfigError("first step must be 'extract'")
    val extractCfg = steps.head._2
    val ordered = bool(extractCfg, "ordered", default = true)
    // optional engine ensemble: [{"type": ..., "weight": ...}] — the
    // reference's EngineExecutorAggregatorFactory JSON shape
    // (vkit/engine/interface.py:279-411)
    val extractFn: Turn => graft.schema.Extraction =
      extractCfg.get("ensemble") match {
        case None => graft.extract.Extractor.extract
        case Some(JArr(items)) =>
          val spec = items.map {
            case o @ JObj(_) =>
              val typ = str(o, "type")
              val w = o.get("weight") match {
                case Some(JNum(v)) => v
                case None => 1.0
                case _ => throw new ConfigError("'weight' must be a number")
              }
              (typ, w)
            case _ => throw new ConfigError(
              "each ensemble entry must be an object")
          }
          t => graft.extract.Extractor.extractEnsemble(spec, t.role,
            t.tool, t.text)
        case _ => throw new ConfigError("'ensemble' must be an array")
      }
    val (out, _) = Job.run(spark, turns, runId, orderOutput = ordered,
      extractFn = extractFn)
    applySteps(spark, out.toDF(), steps.tail, alsoKnown = "extract, ")
  }
}
