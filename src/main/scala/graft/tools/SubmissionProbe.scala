package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.config.Dischema
import graft.pipeline.Pipeline
import graft.queries.DischemaQueries
import graft.readers.Readers

/** Multi-SUBMISSION scale probe: the data-volume probe (ScaleProbe) scales
  * rows; this one scales concurrent submissions through the full
  * four-service pipeline + audit path — the axis a production deployment
  * actually saturates first (scheduler contention, audit-table append
  * storms, stage-checkpoint small-file churn).
  *
  * Runs N identical submissions (customer CSV at the given sf dir) through
  * `Pipeline.runAll` at each requested parallelism, then reads the
  * per-submission latency distribution OUT OF THE AUDIT TABLE (received ->
  * finished timestamps), so the measurement is the same signal an operator
  * would monitor in production.
  *
  * Usage: runMain graft.tools.SubmissionProbe [sfDir] [nSubs] [par1,par2,...]
  */
object SubmissionProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nSubs = if (args.length > 1) args(1).toInt else 50
    val pars = if (args.length > 2) args(2).split(",").map(_.trim.toInt).toSeq else Seq(7, 14)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = "/tmp/graft_subprobe"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    // one shared submitted file (read-only input; every submission gets its
    // own working dir, as discovery would lay them out)
    val dataFile = s"$base/customer.csv"
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .sort("c_custkey").coalesce(1)
      .write.option("header", value = true).csv(dataFile)
    val dischema = Dischema.parseString(DischemaQueries.dischemaJson,
      _ => DischemaQueries.ruleStoreJson)

    println(s"# Submission probe: $nSubs submissions of $sfDir customer, local[$cpus]")
    pars.foreach { par =>
      val auditDir = s"$base/audit-p$par"
      val cfgs = (1 to nSubs).map { i =>
        Pipeline.SubmissionConfig(
          submissionId = f"sub-$i%03d",
          dataFile = dataFile,
          dischema = dischema,
          workingDir = s"$base/work-p$par/$i",
          refdataBaseDir = sfDir,
          auditDir = Some(auditDir),
          csvOptions = Readers.CsvOptions())
      }
      val t0 = System.nanoTime()
      val results = Pipeline.runAll(spark, cfgs, parallelism = par)
      val wall = (System.nanoTime() - t0) / 1e9
      val failures = results.collect { case (id, Left(e)) => s"$id: ${e.getMessage}" }
      // latency distribution straight from the audit table
      val status = spark.read.parquet(s"$auditDir/processing_status")
      val span = status.groupBy("submission_id")
        .agg(((unix_micros(max(col("updated_at"))) -
          unix_micros(min(col("updated_at")))) / 1e6).as("span_sec"))
        .agg(min(col("span_sec")), expr("percentile(span_sec, 0.5)"),
          max(col("span_sec")), count(lit(1))).head()
      val statusRows = status.count()
      val finished = new graft.audit.AuditManager(spark, auditDir)
        .latestProcessingStatus().where(col("processing_status") === "finished").count()
      println(f"par=$par: wall $wall%.1f s (${nSubs / wall}%.2f subs/s), " +
        f"failures ${failures.size}, audit status rows $statusRows " +
        f"(expect ${nSubs * 6}), finished $finished/$nSubs, per-sub span " +
        f"min ${span.getDouble(0)}%.1f / p50 ${span.getDouble(1)}%.1f / " +
        f"max ${span.getDouble(2)}%.1f s over ${span.getLong(3)} subs")
      failures.foreach(f => println(s"  FAILURE $f"))
    }
    spark.stop()
  }
}
