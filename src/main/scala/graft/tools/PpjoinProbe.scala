package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Stage split INSIDE the PPJoin (prefixFilterJoin): PrSplitProbe showed the
  * pair join owns ~90% of q_graph_pagerank at sf1 and CcProbe showed it owns
  * the front half of q_dedup_components — this probe breaks the PPJoin
  * itself into (shingle build+persist) / (token-frequency window) /
  * (per-doc sort collect) / (prefix self-join) / (verify), mirroring
  * Dedup.prefixFilterJoinImpl stage by stage so the dominant shuffle is
  * named by measurement.
  *
  * Usage: runMain graft.tools.PpjoinProbe [sfDir]
  */
object PpjoinProbe {
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
      println(f"$name%-16s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val idCol = "doc_id"
    val threshold = 0.5
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col(idCol), col("text"))
    val withShingles = docs.select(col(idCol), Dedup.shingles(col("text"), 3).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timeIt("shingle-persist")(withShingles.count())
    val exploded = withShingles.select(col(idCol), explode(col("sh")).as("tok"))
    val withCnt = exploded.withColumn("cnt",
      count(lit(1)).over(Window.partitionBy(col("tok")))).persist()
    timeIt("tok-window")(withCnt.count())
    val sorted = withCnt
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("cnt"), col("tok")))).as("sh_sorted"))
      .persist()
    timeIt("doc-sort")(sorted.count())
    val prefixLen = (size(col("sh_sorted")) - ceil(lit(threshold) * size(col("sh_sorted"))).cast("int") + 1).cast("int")
    val prefixes = Dedup.pinPartitions(sorted
      .select(col(idCol), size(col("sh_sorted")).as("sz"),
        posexplode(transform(slice(col("sh_sorted"), lit(1), prefixLen), x => x.getField("tok")))
          .as(Seq("pos", "tok"))),
      col("tok")).persist()
    timeIt("prefix-explode")(prefixes.count())
    val alpha = ceil(lit(threshold / (1 + threshold)) * (col("x.sz") + col("y.sz")) - lit(1e-9))
    val candidates = prefixes.as("x").join(prefixes.as("y"),
        col("x.tok") === col("y.tok") && col(s"x.$idCol") < col(s"y.$idCol")
          && col("y.sz") >= ceil(lit(threshold) * col("x.sz"))
          && col("x.sz") >= ceil(lit(threshold) * col("y.sz"))
          && alpha <= lit(1) + least(col("x.sz") - col("x.pos") - 1, col("y.sz") - col("y.pos") - 1))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b")).persist()
    val nc = timeIt("cand-selfjoin")(candidates.count())
    println(s"candidates=$nc")
    val nd = timeIt("cand-distinct")(candidates.distinct().count())
    println(s"distinct_candidates=$nd")
    // interleaved A/B on the same JVM/minute: the shipped early-exit
    // at-least kernel (verifyPairs) vs the round-12-era full sorted merge
    def fullMerge(): Long = {
      val left = withShingles.select(col(idCol).as("a"), sort_array(col("sh")).as("sh_a"))
      val right = withShingles.select(col(idCol).as("b"), sort_array(col("sh")).as("sh_b"))
      candidates.repartition(32, col("a")).join(left, "a").join(right, "b")
        .withColumn("jaccard", Dedup.jaccardSortedDistinct(col("sh_a"), col("sh_b")))
        .where(col("jaccard") >= threshold)
        .select(col("a"), col("b")).dropDuplicates("a", "b").count()
    }
    var verified = 0L
    for (round <- 1 to 2) {
      verified = timeIt(s"verify-r$round") {
        Dedup.verifyPairsWith(candidates, withShingles, idCol, "sh", threshold)(
          _.dropDuplicates("a", "b").count())
      }
      val vf = timeIt(s"fullmerge-r$round")(fullMerge())
      require(vf == verified, s"early-exit kernel diverged: $vf vs $verified")
    }
    println(s"pairs=$verified")
    val verified2 = timeIt("verify-dedup") {
      Dedup.verifyPairsWith(candidates.distinct(), withShingles, idCol, "sh", threshold)(
        _.count())
    }
    println(s"pairs2=$verified2")
    val verified3 = timeIt("verify-arrexpr") {
      val left = withShingles.select(col(idCol).as("a"), col("sh").as("sh_a"))
      val right = withShingles.select(col(idCol).as("b"), col("sh").as("sh_b"))
      candidates.repartition(32, col("a")).join(left, "a").join(right, "b")
        .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
        .where(col("jaccard") >= threshold)
        .select(col("a"), col("b")).dropDuplicates("a", "b").count()
    }
    println(s"pairs3=$verified3 (old array_intersect/union formulation)")
    val verified4 = timeIt("verify-hashset") {
      val left = withShingles.select(col(idCol).as("a"), col("sh").as("sh_a"))
      val right = withShingles.select(col(idCol).as("b"), col("sh").as("sh_b"))
      candidates.repartition(32, col("a")).join(left, "a").join(right, "b")
        .withColumn("jaccard", Dedup.jaccardDistinct(col("sh_a"), col("sh_b")))
        .where(col("jaccard") >= threshold)
        .select(col("a"), col("b")).dropDuplicates("a", "b").count()
    }
    println(s"pairs4=$verified4 (hash-set intersect count)")
    Seq(withCnt, sorted, prefixes, candidates).foreach(_.unpersist())
    withShingles.unpersist()
    spark.stop()
  }
}
