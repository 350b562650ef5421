package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.{Dedup, Importance, TextStats}

/** Round-9 additions probe at a scaled corpus (default 20x of sf0.1 —
  * 100k docs, the duplication-heavy shape of the r6-r8 probes):
  *
  *  - containmentPairs: candidate-duplication factor (raw candidate rows
  *    vs distinct pairs) — the mass the round-9 pre-verify dropDuplicates
  *    removes before the shingle-array joins — plus end-to-end wall;
  *  - linearQualityScore / urlCanonicalize / gopherColumns walls (the
  *    per-row and broadcast-join lanes at 100k docs).
  *
  * Usage: runMain graft.tools.Round9Probe [sfDir] [factor]
  */
object Round9Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val reps = spark.range(0, factor).toDF("r")
    // same corpus shape as ScaleProbe: 10% exact-dup clusters, 20%
    // near-dup clusters, 70% unique replica mass
    val docs = docs0.crossJoin(reps)
      .select((col("doc_id") + col("r") * 10000000L).as("doc_id"),
        when(col("r") === 0 || col("doc_id") % 10 === 0, col("text"))
          .when(col("doc_id") % 10 <= 2, concat(col("text"), lit(" rep"), col("r")))
          .otherwise(concat_ws(" ",
            transform(split(col("text"), " "), w => concat(w, lit("_"), col("r"))))).as("text"))
      .repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    println(s"[probe] corpus=$nDocs docs (factor $factor)")

    // containment candidate duplication: rebuild the candidate lane the way
    // containmentPairsImpl does, counting raw vs distinct
    val withShingles = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withShingles.count()
    val threshold = 0.8
    val exploded = withShingles.select(col("doc_id"), explode(col("sh")).as("tok"))
    val withCnt = exploded.withColumn("cnt",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))))
    val sorted = withCnt.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("cnt"), col("tok")))).as("sh_sorted"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sorted.count()
    val prefixLen = (size(col("sh_sorted"))
      - ceil(lit(threshold) * size(col("sh_sorted"))).cast("int") + 1).cast("int")
    val prefixes = sorted
      .select(col("doc_id").as("a"), size(col("sh_sorted")).as("a_sz"),
        explode(transform(slice(col("sh_sorted"), lit(1), prefixLen),
          x => x.getField("tok"))).as("tok"))
    val full = sorted
      .select(col("doc_id").as("b"), size(col("sh_sorted")).as("b_sz"),
        explode(transform(col("sh_sorted"), x => x.getField("tok"))).as("tok"))
    val cand = prefixes.join(full,
        prefixes("tok") === full("tok") && col("a") =!= col("b")
          && col("b_sz") >= ceil(lit(threshold) * col("a_sz")))
      .select(col("a"), col("b"))
    val (counts, candSec) = timed {
      cand.agg(count(lit(1)), count_distinct(col("a"), col("b"))).head()
    }
    println(f"[probe] containment candidates: raw=${counts.getLong(0)} " +
      f"distinct=${counts.getLong(1)} dup_factor=${counts.getLong(0).toDouble / counts.getLong(1)}%.2f " +
      f"(counted in $candSec%.1f s)")
    val (nPairs, cSec) = timed(
      Dedup.containmentPairs(docs, "doc_id", "text", 3, threshold).count())
    println(f"[probe] containmentPairs end-to-end: $nPairs pairs in $cSec%.1f s")
    sorted.unpersist(); withShingles.unpersist(); spark.catalog.clearCache()

    val weights = spark.range(0, 4096).select(col("id").as("bucket"),
      (col("id") * 2654435761L % 2001L - 1000L).as("weight_micro"))
    val (kept, clsSec) = timed(
      Importance.linearQualityScore(docs, "doc_id", "text", weights, 4096, 0L)
        .where(col("keep")).count())
    println(f"[probe] linearQualityScore: $kept kept of $nDocs in $clsSec%.1f s")

    val urls = docs.select(col("doc_id"),
      concat(lit("HTTPS://WWW.src"), (col("doc_id") % 50).cast("string"),
        lit(".Example.COM:443/p/"), (col("doc_id") % 1000).cast("string"),
        lit("/?utm_source=x&id="), (col("doc_id") % 97).cast("string"),
        lit("#f")).as("url"))
    val (nCanon, urlSec) = timed(
      urls.select(col("doc_id"), TextStats.urlCanonicalize(col("url")).as("c"))
        .groupBy(col("c")).agg(min(col("doc_id"))).count())
    println(f"[probe] urlCanonicalize + dedup: $nCanon canonical urls in $urlSec%.1f s")

    val (gKept, gSec) = timed(
      docs.select(TextStats.gopherColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
        .where(col("gopher_keep")).count())
    println(f"[probe] gopherColumns: $gKept kept of $nDocs in $gSec%.1f s")
    spark.stop()
  }
}
