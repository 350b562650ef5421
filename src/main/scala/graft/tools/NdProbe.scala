package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing for the semantic-dedup pipeline: pair generation
  * (map-side-dedup plan) vs the full label-propagation resolve, at a given
  * plane count — isolates which stage moved when the candidate-dedup plan
  * changed. Usage: runMain graft.tools.NdProbe [sfDir] [numPlanes]
  */
object NdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "testdata/sf1"
    val planes = if (args.length > 1) args(1).toInt else 12
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ndprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    embs.count()
    val pairs = graft.similarity.Similarity.cosineNearDupPairs(
      embs, "vec_id", "embedding", threshold = 0.45, numPlanes = planes)
    val nPairs = time("pairs.count")(pairs.count())
    println(s"[ndprobe] pairs=$nPairs")
    val again = time("pairs.count (2nd)")(pairs.count())
    require(again == nPairs)
    val sd = time("semanticDedup total")(
      graft.similarity.Similarity.semanticDedup(
        embs, "vec_id", "embedding", threshold = 0.45, numPlanes = planes).count())
    println(s"[ndprobe] semdedup rows=$sd")
    // semanticDedupImpl stage replica with per-stage timers
    val p2 = time("impl: pairs build+persist+count") {
      val p = graft.similarity.Similarity.cosineNearDupPairs(
        embs, "vec_id", "embedding", 0.45, planes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val pairNodes = p2.select(col("a").as("vec_id"))
      .union(p2.select(col("b").as("vec_id"))).distinct()
    val (comp, rel, _) = time("impl: components (eager rounds)")(
      graft.text.Dedup.connectedComponentsImpl(
        pairNodes, p2.select("a", "b"), "vec_id", maxRounds = 50))
    p2.unpersist(blocking = false)
    val fin = time("impl: final left join + count") {
      embs.select(col("vec_id")).join(comp, Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("component"), col("vec_id")).as("component"))
        .withColumn("keep", col("vec_id") === col("component")).count()
    }
    println(s"[ndprobe] final rows=$fin")
    rel()
    spark.stop()
  }
}
