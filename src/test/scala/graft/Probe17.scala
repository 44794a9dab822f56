package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the alternating-star connected components: a
  * 200k-node PATH (diameter 200k — the absolute worst case for label
  * propagation, which would need 200k rounds) plus a 1M-edge random
  * graph, timing the full resolve and verifying component structure.
  */
object Probe17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // 1) path of n nodes: 0-1-2-...-n-1 (diameter n-1)
    val n = 200000L
    val path = spark.range(n - 1)
      .select($"id".as("id_a"), ($"id" + 1).as("id_b"))
    val verts = spark.range(n).toDF("id")
    val (ok1, t1) = time {
      val labels = graft.ops.Clusters
        .connectedComponents(spark, path, verts)
      labels.agg(countDistinct($"comp"), count(lit(1))).collect()(0)
    }
    println(f"PROBE17 path n=$n comps=${ok1.getLong(0)} " +
      f"rows=${ok1.getLong(1)} wall=$t1%.1f s")
    // 2) random graph: 1M edges over 500k nodes (many components of
    // varied size; supercritical enough for a giant component)
    val m = 1000000L
    val nodes = 500000L
    val rand = spark.range(m).select(
      pmod(hash($"id" * 2), lit(nodes)).cast("long").as("id_a"),
      pmod(hash($"id" * 2 + 1), lit(nodes)).cast("long").as("id_b"))
    val verts2 = spark.range(nodes).toDF("id")
    val (ok2, t2) = time {
      graft.ops.Clusters.connectedComponents(spark, rand, verts2)
        .agg(countDistinct($"comp"), count(lit(1))).collect()(0)
    }
    println(f"PROBE17 gnm m=$m n=$nodes comps=${ok2.getLong(0)} " +
      f"rows=${ok2.getLong(1)} wall=$t2%.1f s")
    spark.stop()
  }
}
