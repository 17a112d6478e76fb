package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Round-20 probe: per-job timeline (start/end offsets, task count,
  * summed task ms, first stage name) for one query — separates the
  * serial job chain from parallel work on this job-floor-bound host.
  * `Test/runMain graft.ProbeTimeline <query> [runs]`
  */
object ProbeTimeline {
  case class J(id: Int, var t0: Long = 0L, var t1: Long = 0L,
      var tasks: Int = 0, var taskMs: Long = 0L, var desc: String = "")
  val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
  val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()

  class L extends SparkListener {
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val rec = new J(j.jobId, j.time)
      rec.desc = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        .take(60)
      jobs.put(j.jobId, rec)
      j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
      ()
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      Option(jobs.get(j.jobId)).foreach(_.t1 = j.time); ()
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      if (t.taskInfo != null) {
        Option(stageToJob.get(t.stageId)).flatMap(id => Option(jobs.get(id))).foreach { r =>
          r.synchronized { r.tasks += 1; r.taskMs += t.taskInfo.duration }
        }
      }
      ()
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val dur = (for (a <- i.submissionTime; b <- i.completionTime) yield b - a).getOrElse(0L)
      if (dur > 250) {
        val scopes = i.rddInfos.flatMap(_.scope)
          .map(_.name).distinct.mkString(">")
        println(f"    stage ${i.stageId}%4d dur=${dur / 1000.0}%6.3f tasks=${i.numTasks}%4d  ${scopes.take(200)}")
      }
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new L)
    spark.range(1000).selectExpr("sum(id)").collect()
    // warm pass
    SparkEntry.queries(name)(spark, sfDir).count()
    for (_ <- 0 until runs) {
      jobs.clear(); stageToJob.clear()
      val w0 = System.currentTimeMillis()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"== $name wall=$wall%.3f s ==")
      import scala.jdk.CollectionConverters._
      val js = jobs.values().asScala.toSeq.sortBy(_.t0)
      for (j <- js) {
        val s = (j.t0 - w0) / 1000.0
        val e = (j.t1 - w0) / 1000.0
        println(f"job ${j.id}%3d  [${s}%7.3f -> ${e}%7.3f] dur=${e - s}%6.3f tasks=${j.tasks}%4d taskSum=${j.taskMs / 1000.0}%7.3f  ${j.desc}")
      }
    }
    spark.stop()
  }
}
