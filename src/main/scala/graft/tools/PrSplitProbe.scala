package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.Graph
import graft.text.Dedup

/** Stage split for q_graph_pagerank at a given sf dir: the query is a
  * prefix-filter (PPJoin) pair join over documents, a source-level edge
  * aggregation, then 8 pageRank iterations — this probe times each stage in
  * isolation so the sf1 cost (r11: 42.0 s isolated, 8.8x for 10x data) is
  * attributed to a stage rather than adjudicated by argument. If the pair
  * join owns the majority, PPJoin wins transfer; if the iterations do, the
  * per-round join/checkpoint machinery is the target.
  *
  * Usage: runMain graft.tools.PrSplitProbe [sfDir]
  */
object PrSplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeIt[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-14s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // Stage 1: PPJoin pair generation (the same call the query makes).
    val pairs = Dedup.prefixFilterJoin(d, "doc_id", "text",
      shingleSize = 3, threshold = 0.5).select(col("a"), col("b")).persist()
    val np = timeIt("ppjoin-pairs")(pairs.count())
    println(s"pairs=$np")
    // Stage 2: doc-pair -> source-pair edge aggregation.
    val src = d.select(col("doc_id"), col("source"))
    val e = pairs
      .join(src.select(col("doc_id").as("a"), col("source").as("sa")), Seq("a"))
      .join(src.select(col("doc_id").as("b"), col("source").as("sb")), Seq("b"))
      .select(col("sa"), col("sb"))
    val eg = e.union(e.select(col("sb"), col("sa"))).toDF("s", "d")
      .groupBy(col("s"), col("d")).agg(count(lit(1)).cast("long").as("w"))
      .persist()
    timeIt("edge-agg")(eg.count())
    // Stage 3: the 8 pageRank iterations alone.
    timeIt("pagerank-8")(Graph.pageRank(eg, "s", "d", "w", iterations = 8).count())
    pairs.unpersist(); eg.unpersist()
    spark.stop()
  }
}
