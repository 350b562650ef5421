package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job wall-clock profile of one registered query: runs it once (after a
  * warmup of the session) and prints every Spark job's duration, stage/task
  * counts, and description — the "where do a multi-action operator's seconds
  * go" feedback loop (micro-batch chains, iterative rounds). Also prints the
  * gaps BETWEEN jobs (driver-side planning / streaming-engine bookkeeping),
  * which job timings alone hide.
  *
  * Usage: tools/runjava.sh graft.tools.JobProfiler <query> [sfDir] [reps]
  */
object JobProfiler {
  case class JobRec(id: Int, start: Long, var end: Long = -1L,
                    var stages: Int = 0, var tasks: Int = 0,
                    desc: String)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "16777216")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup (session/codegen init off the measured run)
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try graft.SparkEntry.prepareFixturesCounted(spark, sfDir) catch { case _: Throwable => () }
    try { graft.SparkEntry.queries(name)(spark, sfDir).count(); () }
    catch { case e: Throwable => System.err.println(s"warmup failed: ${e.getMessage}") }
    spark.catalog.clearCache()

    (1 to reps).foreach { rep =>
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
      val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = {
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("")
            .replace('\n', ' ').replaceAll("\\s+", " ")
          val rec = JobRec(e.jobId, e.time, desc = desc.take(110))
          rec.stages = e.stageInfos.size
          rec.tasks = e.stageInfos.map(_.numTasks).sum
          jobs.put(e.jobId, rec)
          order.add(e.jobId)
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit = {
          Option(jobs.get(e.jobId)).foreach(_.end = e.time)
        }
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          // attribute to the owning job via stage->job mapping in jobStart
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(300) // let listener events drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"%n=== $name rep $rep: total $total%.3f s, ${order.size()} jobs ===")
      var prevEnd = -1L
      var jobSum = 0L
      var gapSum = 0L
      order.forEach { id =>
        val j = jobs.get(id)
        val dur = if (j.end > 0) j.end - j.start else -1
        val gap = if (prevEnd > 0) j.start - prevEnd else 0
        if (dur > 0) jobSum += dur
        if (gap > 0) gapSum += gap
        println(f"job ${j.id}%4d  ${dur}%6d ms  gap ${gap}%6d ms  st=${j.stages}%2d tk=${j.tasks}%4d  ${j.desc}")
        if (j.end > 0) prevEnd = math.max(prevEnd, j.end)
      }
      println(f"sum(job) = ${jobSum} ms, sum(gaps between jobs) = ${gapSum} ms, " +
        f"outside-jobs = ${(total * 1000).toLong - jobSum - gapSum} ms")
    }
    spark.stop()
  }
}
