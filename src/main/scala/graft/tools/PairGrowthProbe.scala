package graft.tools

import org.apache.spark.sql.SparkSession

/** Output-growth probe for the pair-emitting families (near-dup pairs,
  * containment, hard negatives): at a scale step the wall-clock ratio alone
  * cannot separate "engine got superlinear" from "the DATA has more
  * qualifying pairs" — replicated fixtures (GenScale copies) make every
  * original record a member of a factor-deep near-dup cluster, so the TRUE
  * pair count grows ~quadratically in the copy factor while input rows grow
  * linearly. This probe runs the named registered queries over each given
  * sf dir and prints rows + wall, so scale adjudications can normalize wall
  * by output demand instead of input size.
  *
  * Usage: runMain graft.tools.PairGrowthProbe q_a,q_b sfDir1 sfDir2 ...
  */
object PairGrowthProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PairGrowthProbe q_a,q_b sfDir1 [sfDir2 ...]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dirs = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    for (dir <- dirs; name <- names) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[pairgrowth] $name dir=$dir rows=$rows wall=$wall%.1f s")
    }
    spark.stop()
  }
}
