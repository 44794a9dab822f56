package graft

import org.apache.spark.sql.SparkSession

/** Round-6 plan artifact dumper: writes `.explain("formatted")` for the
  * named SparkEntry queries to plans/r06/<query>_<suffix>.txt — the
  * before/after evidence files the optimization round commits alongside
  * its claims. Session config mirrors graft.Bench (local[32], 32
  * shuffle partitions, AQE on) so the dumped initial plans match what
  * the bench executes.
  *
  *   sbt "Test/runMain graft.PlanDump06 before /root/testdata/sf0.1 q1 q2 ..."
  */
object PlanDump06 {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val sf = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new java.io.File("plans/r06")
    outDir.mkdirs()
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val f = new java.io.File(outDir, s"${q}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(plan) finally w.close()
      println(s"PLANDUMP06 wrote ${f.getPath} (${plan.length} chars)")
    }
    spark.stop()
  }
}
