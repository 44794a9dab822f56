package graft
import org.apache.spark.sql.SparkSession
object Probe13 {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(name: String): Double = time {
      SparkEntry.queries(name)(spark, sf)
        .write.mode("overwrite").format("noop").save()
    }
    for (q <- Seq("t_dedup_embedding", "t_ngram_jaccard", "t_lang_id"))
      run(q) // warmup each
    val res = collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to 4; q <- Seq("t_dedup_embedding", "t_ngram_jaccard",
      "t_lang_id"))
      res(q) = res(q) :+ run(q)
    res.toSeq.sortBy(_._1).foreach { case (q, ts) =>
      println(f"PROBE13 $q reps=${ts.map(t => f"$t%.2f").mkString(",")} " +
        f"min=${ts.min}%.2f")
    }
    spark.stop()
  }
}
