package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.Graph

/** Empirical scale probe for [[graft.graph.Graph.pageRank]]: a synthetic
  * power-law host graph far beyond the sf corpus (default 10^7 edges over
  * 10^6 nodes — the AsofProbe discipline of probing the axis the sf data
  * cannot reach), timed at increasing iteration counts. What it must show
  * after the round-9 per-iteration `localCheckpoint` fix:
  *
  *  - wall time LINEAR in iterations (per-iteration marginal cost flat
  *    between the 4→8 and 8→16 spans) — the r8 plan doubled per round
  *    (scores referenced twice per iteration, never checkpointed inside
  *    the loop), so 16 iterations would have been 2^8 times the subtree
  *    mass of 8, not 2x the wall;
  *  - driver plan size constant (the returned frame's plan depth does not
  *    grow with iterations — each round starts from a checkpoint scan).
  *
  * The graph is deterministic (hash-derived, no RNG): dst follows a cubed
  * uniform — a skewed in-degree distribution, the shape of real host
  * graphs where a few aggregator hosts absorb most links. ~9% of nodes
  * are dangling (never a source) so the dangling-mass redistribution term
  * is exercised, not vacuous.
  *
  * Usage: runMain graft.tools.PageRankProbe [edges] [nodes]
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = if (args.length > 0) args(0).toLong else 10000000L
    val nNodes = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Power-law-ish edge list: src uniform over the first 91% of nodes
    // (the rest are dangling sinks), dst ~ floor(N * u^3) — heavy mass on
    // low node ids. Weights 1..10.
    val edges = spark.range(nEdges).select(
        pmod(hash(col("id")), lit((nNodes * 91L) / 100L)).cast("long").as("s"),
        expr(s"cast($nNodes * pow(pmod(hash(id * 31L), 1000000) / 1e6, 3.0) as long)").as("d"),
        (pmod(hash(col("id") * 17L), lit(10L)) + 1L).cast("long").as("w"))
      .groupBy(col("s"), col("d")).agg(sum(col("w")).as("w"))
      .localCheckpoint()
    println(s"[probe] edges=${edges.count()} distinct")

    def run(iters: Int): Double = {
      val t0 = System.nanoTime()
      val out = Graph.pageRank(edges, "s", "d", "w", iterations = iters)
      val n = out.count()
      val planLines = out.queryExecution.optimizedPlan.treeString.linesIterator.size
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[probe] iters=$iters%2d wall=$w%7.2f s nodes=$n plan_lines=$planLines")
      w
    }
    run(1) // warm codegen/scheduler outside the comparison
    val t4 = run(4); val t8 = run(8); val t16 = run(16)
    println(f"[probe] marginal per-iteration: 4->8 ${(t8 - t4) / 4}%.3f s, 8->16 ${(t16 - t8) / 8}%.3f s")
    spark.stop()
  }
}
