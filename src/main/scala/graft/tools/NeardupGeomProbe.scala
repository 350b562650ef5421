package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSH geometry dial for cosineNearDupPairs at a scale step: numPlanes=8
  * (the fixture geometry pinned by q_embed_neardup's oracle) gives 2^8=256
  * buckets — fine for sf0.1's 2k vectors (~8/bucket with Hamming-1
  * multiprobe), SATURATED at sf3's 60k (~2.1k/bucket → in-bucket pair
  * enumeration dominates the query). The operator's scale path is the
  * parameter, not a rewrite: this probe measures wall + pairs at the same
  * threshold across plane counts so the saturation and its remedy are both
  * numbers. More planes trade recall at the threshold boundary for bucket
  * occupancy (same dial as MinHash banding geometry, documented at
  * Dedup.minHashDedup).
  *
  * Usage: runMain graft.tools.NeardupGeomProbe [sfDir] [planes,planes,...]
  */
object NeardupGeomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val planes = (if (args.length > 1) args(1) else "8,12,16")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    embs.count() // warm the scan
    for (p <- planes) {
      val t0 = System.nanoTime()
      val rows = graft.similarity.Similarity
        .cosineNearDupPairs(embs, "vec_id", "embedding", threshold = 0.45, numPlanes = p)
        .count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[geom] planes=$p%-3d buckets=${1 << p}%-6d pairs=$rows wall=$wall%.1f s")
    }
    spark.stop()
  }
}
