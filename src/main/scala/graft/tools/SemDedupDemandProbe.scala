package graft.tools

import org.apache.spark.sql.SparkSession

/** Demand probe for q_embed_semdedup: its OUTPUT is one row per vector
  * (linear by construction), so output-growth adjudication needs the
  * internal cosine pair-graph size — the frame label propagation actually
  * iterates over. Prints pair count + wall for the pair stage alone at
  * each sf dir (planes/threshold pinned to the registered query's
  * geometry).
  *
  * Usage: runMain graft.tools.SemDedupDemandProbe sfDir1 [sfDir2 ...]
  */
object SemDedupDemandProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args.toSeq) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val t0 = System.nanoTime()
      val pairs = graft.similarity.Similarity.cosineNearDupPairs(
        e, "vec_id", "embedding", threshold = 0.45, numPlanes = 12).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[semdemand] dir=$dir pairs=$pairs wall=$wall%.1f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
