package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}

/** Job-level wall-clock decomposition of one declared query: registers
  * a SparkListener, runs the query (one warmup pass + one timed pass),
  * and prints every Spark job the timed pass launched with its wall
  * duration and stage/task counts — the local[32] substitute for the
  * Spark UI's job timeline (GraftSession disables the UI). Gaps
  * between jobs are driver-side work (planning, broadcast collects,
  * oracle-free driver logic), printed as GAP rows so planning cost is
  * visible, not inferred.
  *
  * Usage: runMain graft.tools.ProfileJobs <query> [sfDir] [repeats]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)

    case class J(id: Int, start: Long, var end: Long = 0L,
                 var desc: String = "", var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, J]()
    val stageToJob = mutable.HashMap[Int, Int]()
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (recording) {
        val d = Option(e.properties).map(_.getProperty("spark.job.description"))
          .flatMap(Option(_)).getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = J(e.jobId, e.time, desc = d)
          // stage→job map from the job's own stageInfos: AQE broadcast
          // jobs overlap even in local mode, so "most recent job" can
          // credit a stage to the wrong job
          e.stageInfos.foreach(si => stageToJob(si.stageId) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1; j.tasks += e.stageInfo.numTasks
          }
        }
    })

    // warmup pass(es): JIT + codegen + page cache
    (1 to reps).foreach { _ => fn(spark, dir).count(); graft.GraftSession.sweep(spark) }

    val t0 = System.nanoTime()
    recording = true
    val n = fn(spark, dir).count()
    recording = false
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // let listener drain
    println(f"PROFILE $name rows=$n wall=$wall%.3f s, ${jobs.size} jobs")
    var prevEnd = 0L
    jobs.values.toSeq.sortBy(_.start).foreach { j =>
      if (prevEnd > 0 && j.start - prevEnd > 30)
        println(f"  GAP   ${(j.start - prevEnd) / 1e3}%7.3f s  (driver: planning/broadcast/collect)")
      prevEnd = math.max(prevEnd, j.end)
      val d = (j.end - j.start) / 1e3
      println(f"  job ${j.id}%3d ${d}%7.3f s  stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(90)}")
    }
    spark.stop()
  }
}
