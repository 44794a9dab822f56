package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage instrumentation. sbt "Test/runMain graft.Probe3 32" */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val convs = if (args.length > 1) args(1).toLong else 4000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(var tasks: Int = 0, var runMs: Long = 0L,
        var cpuMs: Long = 0L, var gcMs: Long = 0L, var maxTaskMs: Long = 0L,
        var submitted: Long = 0L, var completed: Long = 0L,
        var name: String = "")
    val stages = mutable.LinkedHashMap[Int, St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted)
          : Unit = {
        val st = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        st.submitted = System.currentTimeMillis()
        st.name = e.stageInfo.name.take(40)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted)
          : Unit = {
        val st = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        st.completed = System.currentTimeMillis()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val st = stages.getOrElseUpdate(e.stageId, St())
        st.tasks += 1
        if (e.taskMetrics != null) {
          st.runMs += e.taskMetrics.executorRunTime
          st.cpuMs += e.taskMetrics.executorCpuTime / 1000000L
          st.gcMs += e.taskMetrics.jvmGCTime
          st.maxTaskMs =
            math.max(st.maxTaskMs, e.taskMetrics.executorRunTime)
        }
      }
    })

    Bench.extractionRun(spark, convs) // warmup
    stages.clear()
    val t0 = System.nanoTime()
    Bench.extractionRun(spark, convs)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[p3] cores=$cores wall=$wall%.2f s")
    for ((id, s) <- stages.toSeq.sortBy(_._1))
      println(f"[p3] stage=$id%-4d tasks=${s.tasks}%-4d " +
        f"wall=${(s.completed - s.submitted) / 1000.0}%7.2f " +
        f"sumRun=${s.runMs / 1000.0}%8.2f cpu=${s.cpuMs / 1000.0}%8.2f " +
        f"gc=${s.gcMs / 1000.0}%7.2f maxTask=${s.maxTaskMs / 1000.0}%6.2f  ${s.name}")
    spark.stop()
  }
}
