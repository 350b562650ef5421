package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage-by-stage timing probe for a registered query's subplans.
  * Not part of the engine: a developer tool for finding where a bench line's
  * seconds actually go (run with `sbt "runMain graft.tools.Probe"`).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.text.Dedup
    import org.apache.spark.sql.functions._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("docs count")(docs.count())

    // minhash stages
    val withShingles = docs.repartition(32)
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("shingles persist+count")(withShingles.count())
    val withSig = withShingles.withColumn("sig",
      Dedup.minHashSignature(col("sh"), 192, 42L))
    t("signatures count")(withSig.count())
    val candidates = Dedup.lshCandidates(withSig, "doc_id", "sig", 64, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("lsh candidates count")(candidates.count())
    val verified = Dedup.verifyPairs(candidates, withShingles, "doc_id", "sh", 0.5)
    t("verify count")(verified.count())
    t("minhash end-to-end again") {
      Dedup.minHashDedup(docs, "doc_id", "text", 3, 192, 64, 0.5).count()
    }
    spark.catalog.clearCache()
    // ngram stages (mirror prefixFilterJoin)
    val ws2 = docs.repartition(32)
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("ngram shingles")(ws2.count())
    val exploded = ws2.select(col("doc_id"), explode(col("sh")).as("tok"))
    t("ngram exploded")(exploded.count())
    val tokCounts = exploded.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    t("ngram tokCounts")(tokCounts.count())
    val sorted = exploded.join(tokCounts, "tok")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("cnt"), col("tok")))).as("sh_sorted"))
    t("ngram sorted")(sorted.count())
    val prefixLen = (size(col("sh_sorted")) - ceil(lit(0.5) * size(col("sh_sorted"))).cast("int") + 1).cast("int")
    val prefixes = sorted
      .select(col("doc_id"), size(col("sh_sorted")).as("sz"),
        explode(transform(slice(col("sh_sorted"), lit(1), prefixLen), y => y.getField("tok"))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("ngram prefixes")(println("prefix rows: " + prefixes.count()))
    val cand2 = prefixes.as("x").join(prefixes.as("y"),
        col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id")
          && col("y.sz") >= ceil(lit(0.5) * col("x.sz"))
          && col("x.sz") >= ceil(lit(0.5) * col("y.sz")))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    t("ngram candidates raw")(println("cand rows: " + cand2.count()))
    val dist = cand2.distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("ngram candidates distinct")(println("dist rows: " + dist.count()))
    t("ngram verify")(Dedup.verifyPairs(dist, ws2, "doc_id", "sh", 0.5).count())
    // decompose verify: join-only vs set-op cost
    val left = ws2.select(col("doc_id").as("a"), col("sh").as("sh_a"))
    val right = ws2.select(col("doc_id").as("b"), col("sh").as("sh_b"))
    val joined = dist.repartition(32, col("a")).join(left, "a").join(right, "b")
    t("verify join only")(joined.count())
    t("verify join + intersect size")(
      joined.select(size(array_intersect(col("sh_a"), col("sh_b"))).as("i"))
        .agg(sum(col("i"))).collect())
    t("verify join + union size")(
      joined.select(size(array_union(col("sh_a"), col("sh_b"))).as("u"))
        .agg(sum(col("u"))).collect())
    t("verify full jaccard")(
      joined.withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
        .where(col("jaccard") >= 0.5).count())
    spark.stop()
  }
}
