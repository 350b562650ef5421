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
    t("verify count")(Dedup.verifyPairsWith(
      candidates, withShingles, "doc_id", "sh", 0.5)(_.count()))
    t("minhash end-to-end again") {
      Dedup.minHashDedup(docs, "doc_id", "text", 3, 192, 64, 0.5).count()
    }
    spark.catalog.clearCache()
    // ngram end-to-end is a single-job chain now (window-count frequencies,
    // PPJoin length+position filters, candidates streamed into the verify) —
    // probe the shipped method, not a hand-mirrored copy that drifts.
    t("ngram end-to-end")(Dedup.prefixFilterJoin(docs, "doc_id", "text", 3, 0.5).count())
    t("ngram end-to-end again")(Dedup.prefixFilterJoin(docs, "doc_id", "text", 3, 0.5).count())
    spark.stop()
  }
}
