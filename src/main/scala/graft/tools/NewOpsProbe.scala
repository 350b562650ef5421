package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.{Html, Retrieval, Sampling, SnapshotDiff, TextStats}
import graft.multimodal.Multimodal

/** Scale probe for the round-9-continuation operators at a scaled corpus
  * (default 20x of sf0.1 = 100k docs, same replica shape as Round9Probe):
  * BM25 (postings-filter selectivity + wall), heavy hitters (two-pass
  * prune ratio + wall vs naive), HTML extraction / PII redaction
  * (per-row regex lanes), temperature mixing, snapshot diff, WAV decode.
  *
  * Usage: runMain graft.tools.NewOpsProbe [sfDir] [factor]
  */
object NewOpsProbe {
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
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    val reps = spark.range(0, factor).toDF("r")
    val docs = docs0.crossJoin(reps)
      .select((col("doc_id") + col("r") * 10000000L).as("doc_id"), col("lang"),
        when(col("r") === 0 || col("doc_id") % 10 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("r"))).as("text"))
      .repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    println(s"[probe] corpus=$nDocs docs (factor $factor)")

    // BM25: how much of the token stream survives the pre-shuffle filter
    val terms = Seq("spark", "stream", "join", "vector")
    val totalToks = docs.select(sum(size(TextStats.tokens(col("text"))))).head().getLong(0)
    val matching = docs.select(explode(TextStats.tokens(col("text"))).as("t"))
      .where(col("t").isin(terms: _*)).count()
    val (bm25, bmSec) = timed(
      Retrieval.bm25TopK(docs, "doc_id", "text", terms, 20).collect())
    println(f"[probe] bm25: $totalToks tokens scanned, $matching postings shuffled " +
      f"(${matching * 100.0 / totalToks}%.1f%%), top-${bm25.length} in $bmSec%.1f s")

    // heavy hitters: prune ratio of the bucket sketch, wall vs naive
    val threshold = 500L * factor
    val nDistinctTokens = docs.select(explode(TextStats.tokens(col("text"))).as("t"))
      .select(count_distinct(col("t"))).head().getLong(0)
    val (hh, hhSec) = timed(
      Retrieval.heavyHitters(docs, "text", threshold).collect())
    val (naive, nvSec) = timed(
      docs.select(explode(TextStats.tokens(col("text"))).as("t"))
        .groupBy("t").count().where(col("count") >= threshold).collect())
    println(f"[probe] heavy hitters: $nDistinctTokens distinct tokens, " +
      f"${hh.length} hitters (naive ${naive.length}) — two-pass $hhSec%.1f s vs naive $nvSec%.1f s")

    // the same comparison on a LONG-TAIL vocabulary (each doc appends 20
    // doc-unique tokens -> millions of distinct singletons): the shape the
    // two-level prune exists for — pass 2 only aggregates tokens whose
    // bucket survived, the singleton mass reduces to bucket counts
    val tailDocs = docs.select(col("doc_id"), concat(col("text"),
      concat_ws(" ", (0 until 20).map(i =>
        concat(lit(" u"), col("doc_id"), lit("x" + i))): _*)).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tailDocs.count()
    val tailDistinct = tailDocs.select(explode(TextStats.tokens(col("text"))).as("t"))
      .select(count_distinct(col("t"))).head().getLong(0)
    val (hh2, hh2Sec) = timed(
      Retrieval.heavyHitters(tailDocs, "text", threshold).collect())
    val (naive2, nv2Sec) = timed(
      tailDocs.select(explode(TextStats.tokens(col("text"))).as("t"))
        .groupBy("t").count().where(col("count") >= threshold).collect())
    println(f"[probe] heavy hitters (long tail): $tailDistinct distinct tokens, " +
      f"${hh2.length} hitters (naive ${naive2.length}) — two-pass $hh2Sec%.1f s vs naive $nv2Sec%.1f s")
    tailDocs.unpersist()

    // per-row regex lanes
    val htmlPage = concat(lit("<html><head><script>var x=1<2;</script></head><body><p>"),
      col("text"), lit("</p></body></html>"))
    val (_, htSec) = timed(
      docs.select(length(Html.extractText(htmlPage)).as("l")).agg(sum(col("l"))).head())
    println(f"[probe] html extractText over $nDocs docs: $htSec%.1f s")
    val (_, piiSec) = timed(
      docs.select(TextStats.piiRedactColumns(col("text")).last._2.as("red"))
        .agg(sum(length(col("red")))).head())
    println(f"[probe] pii redaction over $nDocs docs: $piiSec%.1f s")

    // temperature mix + snapshot diff
    val (_, tmSec) = timed(
      Sampling.temperatureMix(docs, "doc_id", "lang",
        TextStats.bpeishTokenCount(col("text")), 1000000L)
        .agg(sum(col("keep").cast("long"))).head())
    println(f"[probe] temperatureMix over $nDocs docs: $tmSec%.1f s")
    val newSnap = docs.where(col("doc_id") % 17 =!= 0)
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 13 === 0, " v2").otherwise("")))
    val (diffCounts, sdSec) = timed(
      SnapshotDiff.diff(docs.where(col("doc_id") % 11 =!= 0), newSnap, "doc_id", "text")
        .groupBy("status").count().collect())
    println(f"[probe] snapshotDiff over $nDocs docs: $sdSec%.1f s " +
      diffCounts.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString("(", ", ", ")"))

    // PMI + entropy lanes
    val (pmi, pmiSec) = timed(
      TextStats.bigramPmi(docs, "text", minCount = 20L * factor, k = 30).collect())
    println(f"[probe] bigramPmi over $nDocs docs: top-${pmi.length} in $pmiSec%.1f s")
    val (entAgg, entSec) = timed(
      docs.select(TextStats.charEntropyColumns(col("text")).last._2.as("h"))
        .agg(avg(col("h"))).head())
    println(f"[probe] charEntropy over $nDocs docs: mean ${entAgg.getDouble(0) / 1e6}%.3f nats in $entSec%.1f s")

    // embeddings: kmeans|| + MMR at replicated vector scale
    val embs0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vecs = embs0.crossJoin(reps)
      .select((col("vec_id") + col("r") * 10000000L).as("vec_id"),
        col("embedding"))
      .repartition(32).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nVecs = vecs.count()
    val (km, kmSec) = timed(
      graft.similarity.Similarity.kmeansParallelInit(vecs, "vec_id", "embedding",
        oversample = 8, rounds = 2).collect())
    println(f"[probe] kmeans|| over $nVecs vectors: ${km.length} seeds in $kmSec%.1f s")
    val (mmr, mmrSec) = timed(
      graft.similarity.Similarity.mmrTopK(vecs.where(col("vec_id") =!= 0),
        vecs.where(col("vec_id") === 0), "vec_id", "embedding",
        k = 10, shortlist = 50).collect())
    println(f"[probe] mmr over $nVecs vectors: top-${mmr.length} in $mmrSec%.1f s")
    vecs.unpersist()

    // multi-frame GIF decode + frame-dedup lanes
    val gifBin = Multimodal.syntheticGif(docs.select("doc_id"), "doc_id", "payload")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    gifBin.count()
    val (gifAgg, gifSec) = timed(
      Multimodal.decodeGifStats(gifBin, "payload")
        .agg(sum(col("n_frames"))).head())
    println(f"[probe] gif decode over $nDocs docs: ${gifAgg.getLong(0)} frames in $gifSec%.1f s")
    val (fd, fdSec) = timed(
      Multimodal.decodeGifFrameSigs(gifBin, "doc_id", "payload")
        .select(sha2(col("frame_sig").cast("binary"), 256).as("sig"), col("doc_id"))
        .groupBy("sig").agg(count_distinct(col("doc_id")).as("nd"))
        .where(col("nd") >= 2).count())
    println(f"[probe] gif frame dedup over $nDocs docs: $fd dup groups in $fdSec%.1f s")
    gifBin.unpersist()

    // WAV decode lane
    val (wavAgg, wavSec) = timed(
      Multimodal.decodeWavStats(
          Multimodal.syntheticWav(docs.select("doc_id"), "doc_id", "payload"), "payload")
        .agg(sum(col("n_samples")), sum(col("silence_frames"))).head())
    println(f"[probe] wav decode over $nDocs docs: ${wavAgg.getLong(0)} samples, " +
      f"${wavAgg.getLong(1)} silent frames in $wavSec%.1f s")
    spark.stop()
  }
}
