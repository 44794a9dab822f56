package graft
import org.apache.spark.sql.SparkSession
object Probe14 {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val stream = SparkEntry.queries("x_streaming_dedupe")(spark, sf)
      .selectExpr("conv_id", "turn_idx", "extracted")
    val batch = SparkEntry.queries("x_transcripts")(spark, sf)
      .selectExpr("conv_id", "turn_idx", "extracted")
    val s1 = stream.count()
    val b1 = batch.count()
    val diff = stream.union(batch).except(stream.intersect(batch)).count()
    println(s"P14 stream=$s1 batch=$b1 symdiff=$diff")
  }
}
