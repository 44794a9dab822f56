package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[p9] $name%-20s ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    t("first-range-count")(spark.range(1000000).count())
    t("range-count")(spark.range(1000000).count())
    t("range-shuffle")(spark.range(1000000).groupBy(($"id" % 100)).count().count())
    t("range-shuffle2")(spark.range(1000000).groupBy(($"id" % 101)).count().count())
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    t("parquet-count")(emb.count())
    t("parquet-count2")(emb.count())
    for (i <- 1 to 3)
      t(s"full-$i")(graft.ops.EmbeddingDedup.nearDuplicates(spark,
        emb.select($"vec_id".as("id"), $"embedding".as("vec")),
        dim = 64).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
