package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch profiler (optimization round): run ONE SparkEntry query and
  * attribute its wall time to the individual Spark jobs it launches —
  * the multi-commit storage/IVM queries run 10-40 jobs each (writes,
  * feed writes, isEmpty probes, collects) and the bench's single number
  * cannot say which of them is the cost. Prints, per job: index, wall
  * seconds, task count, sum of task time, shuffle bytes, and the job
  * group/description when set, plus the gaps BETWEEN jobs (driver-side
  * work: planning, footer census, commit-log IO). Not part of the
  * measured surface.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProfileJobs <sfDir> q124_sql_merge [passes]"
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q124_sql_merge")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    final case class J(id: Int, start: Long, var end: Long = -1L,
        var desc: String = "", var tasks: Int = 0, var taskMs: Long = 0L,
        var shufW: Long = 0L, var shufR: Long = 0L,
        var stages: List[String] = Nil)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, J(e.jobId, e.time, desc = d))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        // attribute the stage to the most recent job still open (local
        // mode runs jobs serially from the driver thread, so this holds)
        val it = order.iterator(); var last: J = null
        while (it.hasNext) { val j = jobs.get(it.next()); if (j != null && j.end < 0) last = j }
        val tgt = if (last != null) last else {
          var mx: J = null; val it2 = order.iterator()
          while (it2.hasNext) { val j = jobs.get(it2.next()); if (j != null) mx = j }
          mx
        }
        if (tgt != null && m != null) {
          tgt.tasks += e.stageInfo.numTasks
          tgt.taskMs += m.executorRunTime
          tgt.shufW += m.shuffleWriteMetrics.bytesWritten
          tgt.shufR += m.shuffleReadMetrics.totalBytesRead
          tgt.stages = (e.stageInfo.name.takeWhile(_ != '+').trim +
            s"(${e.stageInfo.numTasks}t)") :: tgt.stages
        }
      }
    }

    for (pass <- 1 to passes) {
      jobs.clear(); order.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      spark.sparkContext.removeSparkListener(listener)
      println(f"==== pass $pass: $name wall=$wall%.3f s rows=$rows ====")
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.distinct.flatMap(id => Option(jobs.get(id)))
      var prevEnd = -1L
      var jobSum = 0.0
      for (j <- js) {
        val gap = if (prevEnd > 0) (j.start - prevEnd) / 1e3 else 0.0
        val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        jobSum += math.max(dur, 0)
        val d = (if (j.desc.length > 60) j.desc.take(60) else j.desc) +
          " | " + j.stages.reverse.mkString(" ")
        println(f"  [gap ${gap}%6.3f s] job ${j.id}%3d ${dur}%7.3f s tasks=${j.tasks}%3d taskSum=${j.taskMs / 1e3}%8.3f s shW=${j.shufW / 1024}%6d KiB shR=${j.shufR / 1024}%6d KiB  $d")
        prevEnd = j.end
      }
      println(f"  jobs=${js.size} jobWallSum=$jobSum%.3f s (query wall $wall%.3f s; rest = driver-side)")
    }
    spark.stop()
  }
}
