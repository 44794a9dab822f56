package graft

import org.apache.spark.sql.SparkSession

/** Bench harness (driver contract: prints ONE JSON line).
  *
  * Headline: extraction throughput in turns/sec over deterministic
  * synthetic transcripts (seed=42), warmup run excluded, MIN of 3
  * timed runs; plus per-query wall times for every SparkEntry query on
  * SPARK_GRAFT_SF_DIR — interleaved best-of-k (up to 3 round-robin
  * passes for non-trivial queries; reported value = min, with a
  * `spread` map recording per-query (max-min)/min noise evidence).
  * See graft.Scaling for the N-vs-4N efficiency run.
  */
object Bench {

  def timeIt[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  /** Materialize the deterministic bench input table once (fixture
    * prep, excluded from timing — the metric is throughput over an
    * Iceberg-style table, not generator speed).
    */
  def ensureInput(spark: SparkSession, numConvs: Long): String = {
    val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_INPUT",
      s"/tmp/graft-bench-input-$numConvs.parquet")
    if (!new java.io.File(path).exists()) {
      // 64 files: fine-grained scan tasks so a slow split can't become
      // a whole-stage straggler (at cluster scale: size input splits
      // well below cores x target task time)
      graft.synth.SynthTranscripts.turns(spark, numConvs, partitions = 64)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** One extraction pass over the materialized table; returns rows. */
  def extractionRun(spark: SparkSession, numConvs: Long): Long = {
    import spark.implicits._
    val path = ensureInput(spark, numConvs)
    val turns = spark.read.parquet(path).as[graft.schema.Turn]
    val (out, _) = graft.pipe.Job.run(spark, turns, "bench",
      orderOutput = false)
    out.toDF().selectExpr("sum(n_spans)", "count(*)").collect()(0)
      .getLong(1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val numConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "20000")
      .toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline: extraction throughput (turns/sec), warmup excluded.
    // MIN of 3 timed runs — the same steady-state statistic as the
    // per-query protocol below (this box has multi-second noise
    // bursts; a burst landing on one run must not tar the headline)
    var rows = 0L
    rows = extractionRun(spark, numConvs) // warmup (JIT + codegen)
    val times = (1 to 3).map(_ => timeIt {
      rows = extractionRun(spark, numConvs)
    })
    val extractSec = times.min
    val turnsPerSec = rows / extractSec

    // Per-query timings on the sf dir, INTERLEAVED best-of-k: this box
    // has multi-second noise bursts (see BENCH/BASELINE.md), so a
    // single back-to-back pass can tar one query with a burst that has
    // nothing to do with its plan. Protocol: pass 1 times every query
    // once; queries at/above RepeatFloor get a full second round-robin
    // pass; queries still at/above HeavyFloor get a third. Reported
    // value = min across passes (steady state); `spread` = (max-min)/min
    // for every repeated query, so the artifact carries its own noise
    // evidence instead of needing a companion apology document.
    // (Robust-statistic precedent: the reference's median-MAD trim,
    // vkit/pipeline/text_detection/page_resizing.py:64-84.)
    val RepeatFloor = 0.5 // below this, scheduling floor dominates
    val HeavyFloor = 2.0
    // a query that dies must NOT read as "fast" — record its error and
    // surface an errors map in the JSON
    def runOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      var err: Option[String] = None
      val t = timeIt {
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          // strip quotes/backslashes AND all control chars — any
          // unescaped byte < 0x20 makes the whole JSON line unparseable
          err = Some(Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200))
        }
      }
      (t, err)
    }
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    val pass1 = named.map { case (name, fn) =>
      val (t, err) = runOnce(name, fn); (name, Vector(t), err)
    }
    def repeatPass(prev: Seq[(String, Vector[Double], Option[String])],
        floor: Double) =
      prev.map { case (name, ts, err) =>
        if (err.isEmpty && ts.min >= floor) {
          val (t, e2) = runOnce(name, SparkEntry.queries(name))
          (name, ts :+ t, e2.orElse(err))
        } else (name, ts, err)
      }
    val results = repeatPass(repeatPass(pass1, RepeatFloor), HeavyFloor)
    val qs = (results.map { case (n, ts, _) => (n, ts.min) } :+
        ("x_extraction_throughput" -> extractSec))
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val spread = results.collect { case (n, ts, _) if ts.length > 1 =>
      "\"" + n + f"\":${(ts.max - ts.min) / ts.min}%.2f"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (n, _, Some(e)) =>
      "\"" + n + "\":\"" + e + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2.min).sum + extractSec
    println("{\"metric\":\"total\",\"value\":" + f"$total%.3f" +
      ",\"unit\":\"sec\",\"queries\":" + qs +
      ",\"spread\":" + spread +
      ",\"errors\":" + errs +
      ",\"sf\":\"" + sfDir + "\",\"turns\":" + rows +
      ",\"turns_per_sec\":" + turnsPerSec.toLong + "}")
    spark.stop()
  }
}
