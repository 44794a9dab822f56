package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-4 attribution probe: interleaved min-protocol re-measures of
  * the three round-3 official-bench outliers (t_corpus_cleanse 65.2 s,
  * x_pdf_docs 5.94 s, x_html_docs 1.61 s vs documented steady state) at
  * sf0.1, plus a job/stage-count attribution of t_corpus_cleanse — the
  * box has multi-second noise bursts, so configs are interleaved and
  * minima compared (CLAUDE.md protocol).
  */
object Probe16 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queryArgs = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted)
          : Unit = stages += 1
    })
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val queries =
      if (queryArgs.nonEmpty) queryArgs
      else Seq("t_corpus_cleanse", "x_pdf_docs", "x_html_docs")
    def run(name: String): (Double, Int, Int) = {
      val (j0, s0) = (jobs, stages)
      val t = time {
        SparkEntry.queries(name)(spark, sf)
          .write.mode("overwrite").format("noop").save()
      }
      Thread.sleep(200) // let listener events drain
      (t, jobs - j0, stages - s0)
    }
    queries.foreach(run) // warmup each
    val res = collection.mutable.Map[String, List[(Double, Int, Int)]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to 4; q <- queries) res(q) = res(q) :+ run(q)
    res.toSeq.sortBy(_._1).foreach { case (q, ts) =>
      val min = ts.minBy(_._1)
      println(f"PROBE16 $q reps=${ts.map(t => f"${t._1}%.2f").mkString(",")} " +
        f"min=${min._1}%.2f jobs=${min._2} stages=${min._3}")
    }
    spark.stop()
  }
}
