package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM interleaved A/B of the demand-scaled verify parallelism
  * (`graft.verify.scaled`, read at plan-build time): the box CPU is shared
  * and noisy, so cross-run comparisons cannot adjudicate the fix — this
  * probe alternates OFF/ON/OFF/ON per query inside one session, which is
  * the documented read rule for deciding plan changes here.
  *
  * Usage: runMain graft.tools.VerifyScaleProbe [sfDir] [q1,q2,...] [rounds]
  */
object VerifyScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = (if (args.length > 1) args(1)
                 else "q_dedup_ngram,q_dedup_containment,q_embed_semdedup")
      .split(",").map(_.trim).toSeq
    val rounds = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (name <- names; r <- 1 to rounds; scaled <- Seq(false, true)) {
      sys.props("graft.verify.scaled") = scaled.toString
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[vsp] $name round=$r scaled=$scaled rows=$rows wall=$wall%.1f s")
    }
    spark.stop()
  }
}
