package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM interleaved A/B of the tier-1 PPJoin kernels: alternates
  * -Dgraft.ppjoin.kernel between off (expression pipeline) and on per
  * round, timing each registered query's construction + count. One JVM,
  * alternating order, so both sides see the same box noise (the
  * RuleAbProbe pattern). The prop is read at query construction, so
  * flipping it between runs switches the physical path.
  *
  * Usage: tools/runjava.sh graft.tools.KernelAbProbe <query>[,query...] [sfDir] [rounds]
  */
object KernelAbProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 2) args(2).toInt else 3
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
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try graft.SparkEntry.prepareFixturesCounted(spark, sfDir) catch { case _: Throwable => () }
    def time(name: String, kernelOff: Boolean): Double = {
      if (kernelOff) sys.props("graft.ppjoin.kernel") = "off"
      else sys.props.remove("graft.ppjoin.kernel")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    names.foreach { name =>
      // warmup both paths once (codegen/JIT off the measured rounds)
      time(name, kernelOff = true); time(name, kernelOff = false)
      val off = Array.fill(rounds)(0.0)
      val on = Array.fill(rounds)(0.0)
      (0 until rounds).foreach { r =>
        off(r) = time(name, kernelOff = true)
        on(r) = time(name, kernelOff = false)
      }
      def med(a: Array[Double]): Double = a.sorted.apply(a.length / 2)
      println(f"$name: expression median ${med(off)}%.3f s " +
        f"(${off.map(v => f"$v%.2f").mkString(",")}), kernel median ${med(on)}%.3f s " +
        f"(${on.map(v => f"$v%.2f").mkString(",")}), speedup ${med(off) / med(on)}%.2fx")
    }
    spark.stop()
  }
}
