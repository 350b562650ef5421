package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM interleaved A/B of a registered query across two sf dirs — the
  * only adjudication that survives this box's shared-CPU noise (the
  * VerifyScaleProbe pattern): cross-process ratios confound JVM state,
  * suite context and minute-scale load swings; one JVM, alternating
  * rounds, pins the data-size effect alone.
  *
  * Usage: runMain graft.tools.PairedSfProbe <sfDirA> <sfDirB> <query>[,query2,...] [rounds]
  */
object PairedSfProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfA, sfB, queryCsv) = args.take(3)
    val rounds = if (args.length > 3) args(3).toInt else 2
    val names = queryCsv.split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def time(name: String, dir: String): (Double, Long) = {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (secs, n)
    }
    for (name <- names) {
      // warmup both sides once so codegen/class init lands outside the
      // measured rounds
      time(name, sfA); time(name, sfB)
      for (r <- 1 to rounds) {
        val (ta, na) = time(name, sfA)
        val (tb, nb) = time(name, sfB)
        println(f"[paired] $name r$r  A($sfA) ${ta}%7.2f s rows=$na   " +
          f"B($sfB) ${tb}%7.2f s rows=$nb   ratio ${tb / ta}%5.2f")
      }
    }
    spark.stop()
  }
}
