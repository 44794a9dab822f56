package graft
import org.apache.spark.sql.SparkSession
object Probe15 {
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
    run("t_corpus_cleanse") // warmup
    val ts = (1 to 3).map(_ => run("t_corpus_cleanse"))
    println(f"P15 t_corpus_cleanse " +
      f"reps=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f")
  }
}
