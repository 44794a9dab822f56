package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Round-6 per-JOB wall attribution for one SparkEntry query: job id,
  * wall ms, stage count, task count, and the first line of the job's
  * call site — pinpoints which actions inside a multi-job query carry
  * the wall clock (Probe16 gives totals; this gives the breakdown).
  *
  *   sbt "Test/runMain graft.Probe21 <sfDir> <query> [reps]"
  */
object Probe21 {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val q = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class J(start: Long, var end: Long = 0L, stages: Int,
      tasks: Int, site: String, stageIds: Seq[Int] = Nil)
    val jobs = mutable.LinkedHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = J(System.currentTimeMillis(),
            stages = e.stageInfos.size,
            tasks = e.stageInfos.map(_.numTasks).sum,
            site = e.stageInfos.lastOption.map(_.name.take(60))
              .getOrElse("?"),
            stageIds = e.stageInfos.map(_.stageId))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(_.end = System.currentTimeMillis())
        }
    })
    case class StAgg(var tasks: Int = 0, var runMs: Long = 0L,
      var cpuMs: Long = 0L, var deserMs: Long = 0L, var name: String = "")
    val stAgg = mutable.LinkedHashMap[Int, StAgg]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stAgg.synchronized {
          val a = stAgg.getOrElseUpdate(e.stageId, StAgg())
          a.tasks += 1
          if (e.taskMetrics != null) {
            a.runMs += e.taskMetrics.executorRunTime
            a.cpuMs += e.taskMetrics.executorCpuTime / 1000000L
            a.deserMs += e.taskMetrics.executorDeserializeTime
          }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted)
          : Unit = stAgg.synchronized {
        stAgg.getOrElseUpdate(e.stageInfo.stageId, StAgg())
          .name = e.stageInfo.name.take(50)
      }
    })
    def runOnce(tag: String): Double = {
      jobs.synchronized(jobs.clear())
      stAgg.synchronized(stAgg.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROBE21 $q $tag wall=$wall%.2f jobs=${jobs.size}")
      jobs.synchronized {
        jobs.foreach { case (id, j) =>
          val ms = if (j.end > 0) j.end - j.start else -1L
          println(f"PROBE21   job=$id%-4d ms=$ms%-6d " +
            f"stageIds=${j.stageIds.mkString("/")}%-12s " +
            f"tasks=${j.tasks}%-5d site=${j.site}")
        }
      }
      stAgg.synchronized {
        stAgg.toSeq.sortBy(-_._2.runMs).take(8).foreach { case (sid, a) =>
          println(f"PROBE21   stage=$sid%-4d run=${a.runMs}%-6d " +
            f"cpu=${a.cpuMs}%-6d deser=${a.deserMs}%-5d " +
            f"tasks=${a.tasks}%-4d ${a.name}")
        }
      }
      wall
    }
    runOnce("warmup")
    (1 to reps).foreach(i => runOnce(s"rep$i"))
    spark.stop()
  }
}
