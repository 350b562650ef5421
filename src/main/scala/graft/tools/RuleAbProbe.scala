package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM paired A/B of one optimizer-rule exclusion: for each named
  * query, alternate reps with `spark.sql.optimizer.excludedRules` unset (A)
  * and set to InferFiltersFromGenerate (B) on the SAME session (runtime SQL
  * conf, so plans re-optimize per rep) and report paired medians. Alternation
  * means both sides see the same box-noise distribution — the methodology
  * the r15 adjudications used.
  *
  * Usage: tools/runjava.sh graft.tools.RuleAbProbe <sfDir> <reps> <q1,q2,...>
  */
object RuleAbProbe {
  private val Rule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "16777216")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try graft.SparkEntry.prepareFixturesCounted(spark, sfDir) catch { case _: Throwable => () }

    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    names.foreach { name =>
      // warm both plan variants once (codegen compile off the clock)
      spark.conf.unset("spark.sql.optimizer.excludedRules")
      try timeOnce(name) catch { case e: Throwable =>
        println(s"$name FAILED: ${e.getMessage}"); return }
      spark.conf.set("spark.sql.optimizer.excludedRules", Rule)
      timeOnce(name)
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        spark.conf.unset("spark.sql.optimizer.excludedRules")
        a += timeOnce(name)
        spark.conf.set("spark.sql.optimizer.excludedRules", Rule)
        b += timeOnce(name)
      }
      println(f"$name%-32s A(rule on)=${median(a.toSeq)}%7.3f s  B(excluded)=${median(b.toSeq)}%7.3f s  speedup=${median(a.toSeq) / median(b.toSeq)}%5.2fx  " +
        f"a=[${a.map(x => f"$x%.2f").mkString(",")}] b=[${b.map(x => f"$x%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
