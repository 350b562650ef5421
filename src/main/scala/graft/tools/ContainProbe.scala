package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.{Dedup, SortedIntersectCountExpr}

/** Stage split INSIDE containmentPairs: the sf3 step-up (PairGrowthProbe)
  * showed q_dedup_containment's OUTPUT grows linearly (512 → 5.1k → 15.4k)
  * while its wall grows superlinearly (4.4 → 10.4 → ~220 s) — so the cost
  * lives in an intermediate stage, not in output demand. This probe mirrors
  * `Dedup.containmentPairsImpl` stage by stage — (shingle persist) /
  * (token-frequency window) / (per-doc sort) / (prefix×full candidate join,
  * with pre-dedup multiplicity AND distinct counts) / (verify joins) — so
  * the dominant stage is named by measurement.
  *
  * Usage: runMain graft.tools.ContainProbe [sfDir] [threshold]
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = if (args.length > 1) args(1).toDouble else 0.8
    val parts = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.props.getOrElse("graft.probe.initialPartitionNum", parts))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeIt[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[contain] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val idCol = "doc_id"
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col(idCol), col("text"))
    val withShingles = docs.select(col(idCol), Dedup.shingles(col("text"), 3).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timeIt("shingle-persist")(withShingles.count())
    val exploded = withShingles.select(col(idCol), explode(col("sh")).as("tok"))
    val withCnt = exploded.withColumn("cnt",
      count(lit(1)).over(Window.partitionBy(col("tok"))))
    val sorted = withCnt
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("cnt"), col("tok")))).as("sh_sorted"))
      .persist()
    timeIt("tok-window+doc-sort")(sorted.count())
    val prefixLen = (size(col("sh_sorted"))
      - ceil(lit(threshold) * size(col("sh_sorted"))).cast("int") + 1).cast("int")
    val prefixes = Dedup.pinPartitions(sorted
      .select(col(idCol).as("a"), size(col("sh_sorted")).as("a_sz"),
        explode(transform(slice(col("sh_sorted"), lit(1), prefixLen),
          x => x.getField("tok"))).as("tok")),
      col("tok"))
    val full = Dedup.pinPartitions(sorted
      .select(col(idCol).as("b"), size(col("sh_sorted")).as("b_sz"),
        explode(transform(col("sh_sorted"), x => x.getField("tok"))).as("tok")),
      col("tok"))
    val rawCand = prefixes.join(full,
      prefixes("tok") === full("tok") && col("a") =!= col("b")
        && col("b_sz") >= ceil(lit(threshold) * col("a_sz")))
      .select(col("a"), col("b"))
    val nRaw = timeIt("cand-join (raw count)")(rawCand.count())
    val candidates = rawCand.dropDuplicates("a", "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDist = timeIt("cand-distinct")(candidates.count())
    println(s"[contain] candidates raw=$nRaw distinct=$nDist dupFactor=${nRaw.toDouble / math.max(1, nDist)}")
    val left = withShingles.select(col(idCol).as("a"), sort_array(col("sh")).as("sh_a"))
    val right = withShingles.select(col(idCol).as("b"), sort_array(col("sh")).as("sh_b"))
    val n = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val neededC = ceil(lit(threshold) * size(col("sh_a")).cast("double") - lit(1e-9)).cast("int")
    val verified = candidates.repartition(n, col("a"))
      .join(left, "a")
      .join(right, "b")
      .withColumn("__graft_i__",
        SortedIntersectCountExpr.sortedIntersectAtLeast(col("sh_a"), col("sh_b"), neededC))
      .where(col("__graft_i__") >= 0)
      .withColumn("containment",
        col("__graft_i__").cast("double") / size(col("sh_a")).cast("double"))
      .where(col("containment") >= threshold)
      .select(col("a"), col("b"))
      .dropDuplicates("a", "b")
    val nOut = timeIt("verify")(verified.count())
    println(s"[contain] pairs=$nOut")
    spark.stop()
  }
}
