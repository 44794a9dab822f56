package graft
import org.apache.spark.sql.SparkSession
object Probe10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[p10] $name%-14s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 3)
      t(s"repetition-$i")(SparkEntry.queries("t_repetition")(spark, dir)
        .write.mode("overwrite").format("noop").save())
    for (i <- 1 to 3)
      t(s"embedding-$i")(SparkEntry.queries("t_dedup_embedding")(spark,
        dir).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
