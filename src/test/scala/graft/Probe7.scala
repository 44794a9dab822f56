package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Sub-plan timing for the embedding-dedup query. */
object Probe7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[p7] $name%-16s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val twins = emb.select(($"id" + 1000000L).as("id"),
      transform($"vec", x => x * lit(1.01f)).as("vec"))
    val corpus = emb.union(twins)
    t("warmup-scan")(corpus.count())
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
    t("bucket-rows")(rows.count())
    val keptKeys = rows.groupBy($"tbl", $"bucket")
      .agg(count(lit(1)).as("n"))
      .filter($"n" > 1 && $"n" <= 256).select($"tbl", $"bucket")
    t("count-pass")(keptKeys.count())
    val buckets = rows.join(keptKeys, Seq("tbl", "bucket"))
      .groupBy($"tbl", $"bucket")
      .agg(collect_list(struct($"id", $"home")).as("xs"))
    val pairs = buckets.select(explode(expr(
      """filter(
           flatten(transform(xs, (x, i) ->
             transform(slice(xs, i + 2, size(xs)), y ->
               struct(least(x.id, y.id) AS a, greatest(x.id, y.id) AS b,
                      x.home OR y.home AS anyhome)))),
           p -> p.a <> p.b AND p.anyhome)""")).as("p"))
      .select($"p.a".as("id_a"), $"p.b".as("id_b"))
      .distinct()
    t("pairs")(pairs.count())
    t("full")(graft.ops.EmbeddingDedup.nearDuplicates(spark, corpus,
      dim = 64).write.mode("overwrite").format("noop").save())
    t("full-again")(graft.ops.EmbeddingDedup.nearDuplicates(spark, corpus,
      dim = 64).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
