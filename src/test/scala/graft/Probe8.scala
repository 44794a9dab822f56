package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val twins = emb.select(($"id" + 1000000L).as("id"),
      transform($"vec", x => x * lit(1.01f)).as("vec"))
    val corpus = emb.union(twins)
    val pl = spark.sparkContext.broadcast(
      graft.ops.Ann.planeTables(4, 16, 64, 42L))
    val rows = corpus.as[(Long, Seq[Float])]
      .flatMap { case (id, v) =>
        pl.value.iterator.zipWithIndex.flatMap { case (tb, ti) =>
          val b = graft.ops.Ann.signBucket(v, tb)
          Iterator((ti, b, id, true)) ++
            (0 until 16).iterator.map(i => (ti, b ^ (1 << i), id, false))
        }
      }.toDF("tbl", "bucket", "id", "home")
    val sizes = rows.groupBy("tbl", "bucket").count()
    println("[p8] buckets=" + sizes.count())
    sizes.groupBy().agg(max("count"), avg("count"),
      expr("percentile(count, 0.99)"),
      sum(when(col("count") > 256, 1).otherwise(0)).as("over256"),
      sum(when(col("count") > 64, 1).otherwise(0)).as("over64"))
      .show(false)
    sizes.orderBy(desc("count")).limit(10).show(false)
    spark.stop()
  }
}
