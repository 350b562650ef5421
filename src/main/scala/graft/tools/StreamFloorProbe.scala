package graft.tools

import org.apache.spark.sql.{Dataset, Row, SparkSession}

/** Measures the fixed cost of the q_stream_cross_dedup harness WITHOUT the
  * dedup work: same landing fixture, same AvailableNow + maxFilesPerTrigger
  * batching, but the foreachBatch body only counts the batch and the result
  * read-back is skipped. The delta between this and the real query is the
  * operator's true per-run cost; this floor is the streaming machinery
  * (micro-batch planning, offset/commit WAL, file listing) + batch scans.
  *
  * Usage: tools/runjava.sh graft.tools.StreamFloorProbe [sfDir] [reps]
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try graft.SparkEntry.prepareFixturesCounted(spark, sfDir) catch { case _: Throwable => () }
    // locate the same landing fixture the query uses
    val landing = "/tmp/graft_q_stream_cross_dedup/landing"
    val nFiles = Option(new java.io.File(landing).listFiles())
      .map(_.count(f => f.getName.startsWith("part-"))).getOrElse(1)
    val perTrigger = math.max(1, nFiles / 3)
    (1 to reps).foreach { rep =>
      val ckpt = s"/tmp/graft_stream_floor/ckpt_${System.nanoTime()}"
      val t0 = System.nanoTime()
      val src = spark.readStream.schema(spark.read.parquet(landing).schema)
        .option("maxFilesPerTrigger", perTrigger).parquet(landing)
      val q = src.writeStream
        .foreachBatch { (batch: Dataset[Row], _: Long) => batch.count(); () }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      println(f"floor rep $rep: ${(System.nanoTime() - t0) / 1e9}%.3f s ($nFiles files, $perTrigger/trigger)")
    }
    spark.stop()
  }
}
