package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Diagnosis-only harness (NOT a bench artifact): runs one or more queries
  * under a listener that prints per-job wall time and per-stage task-time
  * totals, so seconds can be attributed to scheduling, codegen, shuffles or
  * compute (guide §1.1/§7.1 without a UI). Usage:
  *   sbt "runMain graft.ProfileQuery <sfDir> <query1,query2,...> [repeats]"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq("p14_pipeline")
    val repeats = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // extra conf via env, e.g. SPARK_GRAFT_PROFILE_CONF="spark.sql.adaptive.enabled=false;x=y"
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(desc: String, start: Long, var end: Long = 0L,
                      var stages: Int = 0, var taskTimeMs: Long = 0L,
                      var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.synchronized {
          jobs(js.jobId) = JobRec(d, js.time)
          js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          for (jid <- stageToJob.get(sc.stageInfo.stageId); j <- jobs.get(jid)) {
            j.stages += 1
            j.tasks += sc.stageInfo.numTasks
            j.taskTimeMs += sc.stageInfo.taskMetrics.executorRunTime
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm the session once (codegen, parquet footers) like Bench does
    try SparkEntry.queries("p02_tokens_full")(spark, sfDir).count()
    catch { case _: Throwable => () }

    import org.apache.spark.metrics.source.CodegenMetrics
    for (name <- names; rep <- 1 to repeats) {
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val cg0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val cgT0 = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tCons = (System.nanoTime() - t0) / 1e9
      val agg = df.groupBy().count() // what Dataset.count() runs internally
      agg.queryExecution.executedPlan // force analysis+optimization+planning
      val tPlan = (System.nanoTime() - t0) / 1e9 - tCons
      agg.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rep=$rep construct=$tCons%.3f plan=$tPlan%.3f exec=${wall - tCons - tPlan}%.3f")
      if (rep == repeats && sys.env.contains("SPARK_GRAFT_PROFILE_EXPLAIN"))
        println(agg.queryExecution.executedPlan.toString.take(25000))
      Thread.sleep(200) // let listener drain
      val ph = agg.queryExecution.tracker.phases
        .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }.mkString(" ")
      val cgN = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - cg0
      println(f"[profile] $name rep=$rep wall=$wall%.3f s  phases: $ph  codegenCompiles=$cgN")
      var sumJob = 0L
      jobs.synchronized {
        jobs.foreach { case (id, j) =>
          val w = j.end - j.start
          sumJob += math.max(w, 0L)
          println(f"[profile]   job $id%3d wall=${w}%5d ms stages=${j.stages}%2d tasks=${j.tasks}%4d taskTime=${j.taskTimeMs}%6d ms  ${j.desc.take(80)}")
        }
        println(f"[profile]   njobs=${jobs.size} sumJobWall=${sumJob} ms (wall-sumJob = driver/planning gap)")
      }
    }
    if (sys.env.contains("SPARK_GRAFT_PROFILE_RULES"))
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
