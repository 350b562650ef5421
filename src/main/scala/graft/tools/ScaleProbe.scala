package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.Dedup
import graft.similarity.Similarity

/** One-off empirical scale probe for the dedup/ANN family: scales the sf
  * corpus by `factor` (default 10x), runs each operator, and records wall
  * times, bucket-occupancy histograms, and candidate mass into SCALE.md.
  *
  * The scaled corpus is deliberately duplication-heavy — the shape that
  * stresses bucketed algorithms:
  *  - 10% of docs replicate UNCHANGED (exact-dup clusters of `factor`),
  *  - 20% replicate with a light perturbation (near-dup clusters),
  *  - 70% replicate scrambled (unique mass).
  * Embeddings replicate with deterministic per-(id, replica, dim) jitter,
  * so each base vector becomes a near-dup cluster.
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir] [factor] [outFile]
  */
object ScaleProbe {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** max / p99 / mean occupancy and the pair mass sum n*(n-1)/2 of a
    * bucket-size frame with a `count` column (approx_percentile: the exact
    * aggregate would buffer every bucket count in one task).
    */
  private def occupancy(buckets: DataFrame): (Long, Double, Double, Long, Long) = {
    val r = buckets.agg(
      max(col("count")), expr("approx_percentile(count, 0.99, 10000)").cast("double"),
      avg(col("count")),
      sum(col("count") * (col("count") - 1) / 2).cast("bigint"),
      count(lit(1))).head()
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val outFile = if (args.length > 2) args(2) else "SCALE.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = new StringBuilder
    // rewrite the file per line: progress stays visible even if a later
    // step stalls (the first probe run was opaque for 18 min)
    def line(s: String): Unit = {
      report.append(s).append('\n')
      java.nio.file.Files.writeString(java.nio.file.Path.of(outFile), report.toString)
      println(s)
    }

    // ---- scaled documents -------------------------------------------------
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val reps = spark.range(0, factor).toDF("r")
    val docs = docs0.crossJoin(reps)
      .select((col("doc_id") + col("r") * 10000000L).as("doc_id"),
        when(col("r") === 0 || col("doc_id") % 10 === 0, col("text"))
          .when(col("doc_id") % 10 <= 2, concat(col("text"), lit(" rep"), col("r")))
          // unique mass: every word suffixed with the replica, so replicas
          // share NO shingles (a shared suffix-free transform would leave
          // accidental near-dup clusters)
          .otherwise(concat_ws(" ",
            transform(split(col("text"), " "), w => concat(w, lit("_"), col("r"))))).as("text"))
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    val embs0 = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val embs = embs0.crossJoin(reps)
      .select((col("vec_id") + col("r") * 10000000L).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, d) =>
            (x.cast("double") +
              (pmod(xxhash64(col("vec_id"), col("r"), d), lit(1000)) - 500).cast("double") / 20000.0)
              .cast("float"))).as("embedding"))
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEmbs = embs.count()

    line(s"# SCALE probe — ${factor}x of $sfDir")
    line("")
    line(s"Corpus: $nDocs documents (10% exact-dup clusters, 20% near-dup clusters, " +
      s"70% unique), $nEmbs embeddings (near-dup clusters of $factor). local[$cpus], " +
      s"shuffle.partitions=$cpus.")
    line("")

    // ---- MinHash-LSH band-bucket occupancy --------------------------------
    val sig = docs.select(col("doc_id"),
      Dedup.minHashSignature(Dedup.shingles(col("text"), 3), 192).as("sig"))
    val bandBuckets = sig
      .select(posexplode(Dedup.bandColumns(col("sig"), 64, 3)).as(Seq("band", "bh")))
      .groupBy("band", "bh").count()
    val (bMax, bP99, bMean, bPairs, bBuckets) = occupancy(bandBuckets)
    line("## MinHash-LSH (192 hashes, 64 bands x 3)")
    line("")
    line(f"- band-bucket occupancy: max $bMax, p99 $bP99%.1f, mean $bMean%.2f over $bBuckets buckets")
    line(f"- raw candidate mass (sum n(n-1)/2): $bPairs (cap 10000/bucket engaged: ${bMax > 10000})")
    val (mhPairs, mhSec) = timed(
      Dedup.minHashDedup(docs, "doc_id", "text", 3, 192, 64, 0.5).count())
    line(f"- minHashDedup end-to-end: $mhPairs verified pairs in $mhSec%.1f s")
    spark.catalog.clearCache()
    line("")

    // ---- PPJoin prefix-token skew ----------------------------------------
    val shingleFreq = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("tok"))
      .groupBy("tok").count()
    val (tMax, tP99, tMean, _, tTokens) = occupancy(shingleFreq)
    line("## PPJoin exact Jaccard (threshold 0.5)")
    line("")
    line(f"- shingle posting lists: max $tMax, p99 $tP99%.1f, mean $tMean%.2f over $tTokens tokens")
    val (ppPairs, ppSec) = timed(
      Dedup.prefixFilterJoin(docs, "doc_id", "text", 3, 0.5).count())
    line(f"- prefixFilterJoin end-to-end: $ppPairs pairs in $ppSec%.1f s")
    spark.catalog.clearCache()
    line("")

    // ---- SimHash chunk buckets -------------------------------------------
    val sh = docs.select(Dedup.simHash(col("text")).as("s"))
      .select(col("s.hi").as("hi"), col("s.lo").as("lo"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def chunkOccupancy(frame: DataFrame) = occupancy(
      frame.select(posexplode(array(
          (col("hi") / 65536).cast("bigint"), pmod(col("hi"), lit(65536)),
          (col("lo") / 65536).cast("bigint"), pmod(col("lo"), lit(65536))))
          .as(Seq("chunk", "cv")))
        .groupBy("chunk", "cv").count())
    val (cMax, cP99, cMean, cPairs, cBuckets) = chunkOccupancy(sh)
    line("## SimHash near-dup (16-bit chunk bands, Hamming <= 3)")
    line("")
    line(f"- per-DOC chunk occupancy: max $cMax, p99 $cP99%.1f, mean $cMean%.2f over $cBuckets buckets")
    line(f"- per-doc raw candidate mass (what the pre-collapse rework avoids): $cPairs")
    // what candidate generation actually joins since the signature
    // pre-collapse: one row per DISTINCT signature
    val (dMax, dP99, dMean, dPairs, dBuckets) = chunkOccupancy(sh.distinct())
    line(f"- DISTINCT-signature chunk occupancy: max $dMax, p99 $dP99%.1f, mean $dMean%.2f over $dBuckets buckets")
    line(f"- distinct-signature candidate mass (the join's real driver): $dPairs")
    sh.unpersist()
    val (shPairs, shSec) = timed(
      Dedup.simHashNearDup(docs, "doc_id", "text", maxHamming = 3).count())
    line(f"- simHashNearDup end-to-end (exact, no cap): $shPairs pairs in $shSec%.1f s")
    spark.catalog.clearCache()
    val ((cappedPairs, capStats), capSec) = timed {
      val (frame, stats) = Dedup.simHashNearDupWithStats(docs, "doc_id", "text",
        maxHamming = 3, maxBucketSize = 1000)
      (frame.count(), stats)
    }
    capStats.foreach(s => line(f"- capped run (maxBucketSize=1000): $cappedPairs pairs in " +
      f"$capSec%.1f s; dropped ${s.droppedChunkRows} signature-chunk rows across " +
      f"${s.droppedBuckets} buckets (largest ${s.maxBucketN}) — cap is measured, never silent"))
    spark.catalog.clearCache()
    line("")

    // ---- near-dup cluster resolution --------------------------------------
    val (ccDropped, ccSec) = timed(
      graft.text.Dedup.nearDupComponents(docs, "doc_id", "text", 3, 0.5)
        .where(col("keep") === false).count())
    line("## Near-dup cluster resolution (components + keeper)")
    line("")
    line(f"- nearDupComponents: $ccDropped non-keeper docs in $ccSec%.1f s " +
      "(PPJoin pairs + iterative min-label propagation over pair-graph nodes only)")
    spark.catalog.clearCache()
    line("")

    // ---- exact dedup ------------------------------------------------------
    val (exGroups, exSec) = timed(Dedup.exactDedup(docs, "doc_id", "text").count())
    line("## Exact dedup (sha-256 group-by)")
    line("")
    line(f"- $exGroups distinct-content groups in $exSec%.1f s")
    line("")

    // ---- duplicate-span detection ----------------------------------------
    // exact-dup clusters make every window of 10% of docs duplicated, and
    // the shared base vocabulary repeats k-grams across docs — both the
    // count-aggregation hot path and the islands windows get real mass
    val ((spanCount, spanTokens), spanSec) = timed {
      val sp = graft.text.SpanDedup.dupSpans(docs, "doc_id", "text", k = 4, minTokens = 6)
      val r = sp.agg(count(lit(1)), sum(col("n_tokens"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    line("## Duplicate-span detection (k=4 windows, spans >= 6 tokens)")
    line("")
    line(f"- dupSpans: $spanCount spans covering $spanTokens tokens in $spanSec%.1f s " +
      "(kgram count agg is linear — map-side combine absorbs hot boilerplate windows)")
    val (stripDropped, stripSec) = timed(
      graft.text.SpanDedup.stripDupSpans(docs, "doc_id", "text", k = 4)
        .agg(sum(col("n_dropped"))).head().getLong(0))
    line(f"- stripDupSpans: $stripDropped tokens dropped (keep-globally-first) in $stripSec%.1f s")
    spark.catalog.clearCache()
    line("")

    // ---- edit-distance near-dup -------------------------------------------
    // the skew signal: occupancy of the 32-char prefix/suffix key groups
    // (the exact-dup clusters all share edge keys -> hottest groups)
    val edgeKeys = docs.select(substring(col("text"), 1, 32).as("k"))
      .unionAll(docs.select(substring(col("text"), -32, 32).as("k")))
      .groupBy("k").count()
    val (ekMax, ekP99, ekMean, ekPairs, ekBuckets) = occupancy(edgeKeys)
    line("## Edit-distance near-dup (untouched-edge keys + banded Levenshtein)")
    line("")
    line(f"- edge-key occupancy: max $ekMax, p99 $ekP99%.1f, mean $ekMean%.2f over " +
      f"$ekBuckets keys; raw candidate mass $ekPairs")
    val (edPairs, edSec) = timed(
      graft.text.EditDistance.editDistancePairs(docs, "doc_id", "text",
        maxDist = 6, keyLen = 32).count())
    line(f"- editDistancePairs (d<=6): $edPairs pairs in $edSec%.1f s")
    spark.catalog.clearCache()
    line("")

    // ---- incremental bloom dedup ------------------------------------------
    // reference = half the corpus; because exact-dup clusters straddle the
    // halves, the batch has real duplicate mass. Compare against the plain
    // anti-join to show what the sketch pre-filter saves.
    val refHalf = docs.where(col("doc_id") % 2 === 1)
    val batchHalf = docs.where(col("doc_id") % 2 === 0)
    val nBatch = batchHalf.count()
    val bloomBytesArr = graft.text.IncrementalDedup.bloomBytes(
      refHalf, col("text"), expectedItems = nDocs, numBits = nDocs * 10)
    val suspects = batchHalf.where(
      graft.text.IncrementalDedup.mightContain(bloomBytesArr, col("text"))).count()
    val (incNew, incSec) = timed(
      graft.text.IncrementalDedup.newAgainstReference(batchHalf, refHalf, "text",
        expectedItems = nDocs, numBits = nDocs * 10).count())
    val (plainNew, plainSec) = timed(
      batchHalf.join(refHalf.select("text").distinct(), Seq("text"), "left_anti").count())
    line("## Incremental bloom dedup (batch=even ids vs reference=odd ids)")
    line("")
    line(f"- sketch ${bloomBytesArr.length / 1024} KiB for ${nDocs / 2} ref texts; " +
      f"bloom-positive suspects $suspects of $nBatch batch rows " +
      f"(${100.0 * suspects / nBatch}%.1f%% enter the anti-join)")
    line(f"- newAgainstReference: $incNew new rows in $incSec%.1f s " +
      f"(plain anti-join: $plainNew rows in $plainSec%.1f s)")
    spark.catalog.clearCache()
    line("")

    // ---- bigram LM scoring ------------------------------------------------
    val (bgDocs, bgSec) = timed(
      graft.text.TextStats.bigramLmScore(docs, "doc_id", "text").count())
    line("## Bigram-LM fluency scoring")
    line("")
    line(f"- bigramLmScore: $bgDocs docs scored in $bgSec%.1f s " +
      "(two partial-agg counts + one bigram-keyed join back)")
    spark.catalog.clearCache()
    line("")

    // ---- cross-corpus dedup ----------------------------------------------
    // fresh/reference split by id parity: every near-dup cluster straddles
    // the boundary, so cross-pair mass is representative
    val (xPairs, xSec) = timed(
      Dedup.minHashCrossDedupWith(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text")(_.count()))
    line("## Cross-corpus dedup (MinHash bands BETWEEN sides only)")
    line("")
    line(f"- minHashCrossDedup (fresh=even ids, ref=odd): $xPairs cross pairs in $xSec%.1f s")
    spark.catalog.clearCache()
    line("")

    // ---- boilerplate line removal ----------------------------------------
    // every doc gains a universal line + a 10%-family line + a unique line —
    // the hot-key shape (one line key carries the whole corpus count)
    val docsLines = docs.select(col("doc_id"), concat_ws("\n",
      col("text"), lit("SUBSCRIBE NOW"),
      concat(lit("family "), pmod(col("doc_id"), lit(10))),
      concat(lit("ref "), col("doc_id"))).as("text"))
    val ((ldRows, ldDropped), ldSec) = timed {
      val out = graft.text.TextStats.lineDedup(docsLines, "doc_id", "text", 0.05)
      val r = out.agg(count(lit(1)), count(when(!col("keep"), true))).head()
      (r.getLong(0), r.getLong(1))
    }
    line("## Boilerplate line removal (cross-doc line frequency)")
    line("")
    line(f"- lineDedup over ${4} lines/doc: $ldRows line rows, $ldDropped dropped " +
      f"(universal + family lines) in $ldSec%.1f s — the boilerplate key mass " +
      "collapses in the map-side partial aggregation")
    spark.catalog.clearCache()
    line("")

    // ---- semantic dedup ---------------------------------------------------
    val planesForScale = 12
    val ((sdClusters, sdDropped), sdSec) = timed {
      Similarity.semanticDedupWith(embs, "vec_id", "embedding",
        threshold = 0.45, numPlanes = planesForScale) { out =>
        val r = out.agg(count_distinct(col("component")),
          count(when(!col("keep"), true))).head()
        (r.getLong(0), r.getLong(1))
      }
    }
    line("## Semantic dedup (cosine pair graph -> components -> keeper)")
    line("")
    line(f"- semanticDedup @$planesForScale planes: $sdClusters clusters, " +
      f"$sdDropped non-keepers in $sdSec%.1f s (pair-graph-node-only propagation)")
    spark.catalog.clearCache()
    line("")

    // ---- embedding LSH buckets: the planes dial ---------------------------
    line("## Embedding cosine near-dup (sign-LSH + Hamming-1 probes)")
    line("")
    for (planes <- Seq(8, 12, 16)) {
      val codeBuckets = embs
        .select(Similarity.lshCode(col("embedding"), planes).as("code"))
        .groupBy("code").count()
      val (eMax, eP99, eMean, ePairs, eBuckets) = occupancy(codeBuckets)
      line(f"- $planes planes: bucket max $eMax, p99 $eP99%.1f, mean $eMean%.2f over " +
        f"$eBuckets used buckets; same-bucket pair mass $ePairs " +
        f"(x~${planes + 1} with Hamming-1 probes)")
    }
    val (ndPairs, ndSec) = timed(
      Similarity.cosineNearDupPairs(embs, "vec_id", "embedding",
        threshold = 0.45, numPlanes = 12).count())
    line(f"- cosineNearDupPairs @12 planes end-to-end: $ndPairs pairs in $ndSec%.1f s")
    val (knnRows, knnSec) = timed(
      Similarity.lshKnn(embs, embs.where(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, numPlanes = 12).count())
    line(f"- lshKnn (10 queries, k=5) @12 planes: $knnRows rows in $knnSec%.1f s")
    line("")

    docs.unpersist(); embs.unpersist()
    java.nio.file.Files.writeString(java.nio.file.Path.of(outFile), report.toString)
    println(s"wrote $outFile")
    spark.stop()
  }
}
