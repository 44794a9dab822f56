package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans of the key pipelines to stdout (the
  * source for PLANS.md). sbt "Test/runMain graft.DumpPlans"
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"

    def dump(title: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $title =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString(
          "formatted")))
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-plans")
      .toString
    spark.createDataset(graft.synth.GoldenData.inputTurns)
      .write.mode("overwrite").parquet(dir)
    val turns = spark.read.parquet(dir).as[graft.schema.Turn]

    dump("extraction pipeline (ordered / range path)",
      graft.pipe.Job.run(spark, turns, "plans")._1.toDF())
    dump("extraction pipeline (hash path)",
      graft.pipe.Job.run(spark, turns, "plans",
        orderOutput = false)._1.toDF())
    dump("q_broadcast_join", SparkEntry.queries("q_broadcast_join")(
      spark, sf))
    dump("q_interval_join", SparkEntry.queries("q_interval_join")(
      spark, sf))
    dump("x_html_docs (oracle-checked end-to-end extraction)",
      SparkEntry.queries("x_html_docs")(spark, sf))
    dump("q_asof_join (union + one keyed exchange)",
      SparkEntry.queries("q_asof_join")(spark, sf))
    dump("q_skew_salted (shuffled hash join on (k, salt))",
      SparkEntry.queries("q_skew_salted")(spark, sf))
    dump("t_kmv_distinct (ObjectHashAggregate partial/merge)",
      SparkEntry.queries("t_kmv_distinct")(spark, sf))
    dump("t_bm25 (inverted index + broadcast query-side joins)",
      SparkEntry.queries("t_bm25")(spark, sf))
    dump("t_decontaminate (broadcast bench grams)",
      SparkEntry.queries("t_decontaminate")(spark, sf))
    dump("t_pack (one bucket exchange, slim window rows)",
      SparkEntry.queries("t_pack")(spark, sf))
    dump("t_dedup_lines (distinct-pair count + strip anti-join)",
      SparkEntry.queries("t_dedup_lines")(spark, sf))
    dump("t_dedup_substr (rolling fingerprints, long-only shuffle)",
      SparkEntry.queries("t_dedup_substr")(spark, sf))
    dump("t_bloom_decontaminate (blob literal, zero corpus shuffle)",
      SparkEntry.queries("t_bloom_decontaminate")(spark, sf))
    spark.stop()
  }
}
