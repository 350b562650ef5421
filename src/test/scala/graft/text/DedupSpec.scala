package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy cat tonight"), // near-dup of 1
    (3L, "an entirely different sentence about spark and scala engines"),
    (4L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
    (5L, "short text")
  ).toDF("doc_id", "text")

  test("shingles produces distinct word n-grams; short docs fall back to whole text") {
    val sh = corpus.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val row1 = sh.where("doc_id = 1").select("sh").as[Seq[String]].head()
    assert(row1.contains("the quick brown") && row1.contains("lazy dog tonight"))
    assert(row1.size == 8)
    val row5 = sh.where("doc_id = 5").select("sh").as[Seq[String]].head()
    assert(row5 == Seq("short text"))
  }

  test("exactDedup groups identical texts") {
    val out = Dedup.exactDedup(corpus, "doc_id", "text")
    assert(out.count() == 4)
    assert(out.where("dup_count = 2").select("keep_id").as[Long].head() == 1L)
  }

  test("prefixFilterJoin finds exactly the pairs above the threshold (vs brute force)") {
    val out = Dedup.prefixFilterJoin(corpus, "doc_id", "text", 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("bracket forms release the shingle cache once use returns") {
    spark.catalog.clearCache()
    val pairs = Dedup.minHashDedupWith(corpus, "doc_id", "text")(
      _.select("a", "b").as[(Long, Long)].collect().toSet)
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    val exact = Dedup.prefixFilterJoinWith(corpus, "doc_id", "text")(
      _.select("a", "b").as[(Long, Long)].collect().toSet)
    assert(exact == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("connectedComponents resolves pair graphs into min-labelled clusters") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    // two components {1,2,4} (via 1-2, 2-4) and {5,6}; 3 and 7 singletons
    val edges = Seq((1L, 2L), (2L, 4L), (5L, 6L)).toDF("a", "b")
    val out = Dedup.connectedComponents(nodes, edges, "id")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 3L -> 3L,
      5L -> 5L, 6L -> 6L, 7L -> 7L).updated(6L, 5L))
    // a chain needs label propagation across multiple rounds
    val chain = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("a", "b")
    val chainNodes = (10L to 14L).toDF("id")
    val chainOut = Dedup.connectedComponents(chainNodes, chain, "id")
      .as[(Long, Long)].collect().toMap
    assert(chainOut.values.toSet == Set(10L))
  }

  test("nearDupComponents keeps exactly one canonical doc per dup cluster") {
    val out = Dedup.nearDupComponents(corpus, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Boolean)].collect()
    val byId = out.map(r => r._1 -> ((r._2, r._3))).toMap
    // {1,2,4} cluster (near/exact dups), 3 and 5 singletons
    assert(byId(1L) == ((1L, true)) && byId(2L) == ((1L, false)) && byId(4L) == ((1L, false)))
    assert(byId(3L) == ((3L, true)) && byId(5L) == ((5L, true)))
    assert(out.count(_._3) == 3)
  }

  test("minHashDedup with wide bands matches the exact join output") {
    val out = Dedup.minHashDedup(corpus, "doc_id", "text",
      shingleSize = 3, numHashes = 192, numBands = 64, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("minhash signature of identical texts is identical; jaccard=1 pair verified") {
    val withSh = corpus.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val sigs = withSh.withColumn("sig", Dedup.minHashSignature(col("sh"), 64))
      .where("doc_id IN (1, 4)").select("sig").as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == 64)
  }

  test("jaccard column computes |I|/|U|") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    assert(df.select(Dedup.jaccard(col("x"), col("y"))).as[Double].head() == 0.5)
  }

  test("simHash is deterministic and identical for identical texts, near for near-dups") {
    val sh = corpus.withColumn("s", Dedup.simHash(col("text")))
      .select(col("doc_id"), col("s.hi"), col("s.lo")).as[(Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(sh(1L) == sh(4L))
    def bits(hl: (Long, Long)): Long = java.lang.Long.bitCount(hl._1 ^ sh(1L)._1) +
      java.lang.Long.bitCount(hl._2 ^ sh(1L)._2)
    assert(bits(sh(2L)) < bits(sh(3L))) // near-dup closer than unrelated
    assert((sh(1L)._1 | sh(1L)._2) >= 0 && sh(1L)._1 < (1L << 32))
  }

  test("minHashDedup default geometry has ~1.0 recall AT the threshold boundary") {
    // 100 pairs engineered to sit EXACTLY at jaccard = 0.5: each doc is a
    // set of 30 unique words (shingleSize = 1 -> shingles are the words),
    // the pair shares 20 of them -> |I|/|U| = 20/40 = 0.5. The default
    // r=3/b=64 geometry misses a boundary pair with prob 0.875^64 ~ 2e-4
    // (expected misses out of 100: 0.02); the r=4/b=32 geometry this test
    // guards against would miss ~13 of them.
    val rnd = new scala.util.Random(3)
    val docs = (0 until 100).flatMap { i =>
      val shared = (0 until 20).map(j => s"s${i}_$j")
      val onlyA = (0 until 10).map(j => s"a${i}_$j")
      val onlyB = (0 until 10).map(j => s"b${i}_$j")
      Seq((i.toLong * 2, rnd.shuffle(shared ++ onlyA).mkString(" ")),
        (i.toLong * 2 + 1, rnd.shuffle(shared ++ onlyB).mkString(" ")))
    }.toDF("doc_id", "text")
    val pairs = Dedup.minHashDedup(docs, "doc_id", "text", shingleSize = 1, threshold = 0.5)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.forall(_._3 == 0.5))
    val expected = (0 until 100).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    val recall = (pairs.map(p => (p._1, p._2)).toSet & expected).size.toDouble / expected.size
    assert(recall >= 0.99, s"boundary recall $recall")
  }

  test("simHashNearDup pairs exact duplicates at hamming 0 and skips unrelated docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely unrelated words about databases query engines and shuffles")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simHashNearDup(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("lshCandidates respects the bucket-size cap") {
    val same = (1 to 20).map(i => (i.toLong, "identical text for everyone here today")).toDF("doc_id", "text")
    val withSig = same.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("sig", Dedup.minHashSignature(col("sh"), 16))
    val capped = Dedup.lshCandidates(withSig, "doc_id", "sig", 4, 4, maxBucketSize = 5)
    assert(capped.count() == 0) // every bucket has 20 ids > cap
    val uncapped = Dedup.lshCandidates(withSig, "doc_id", "sig", 4, 4, maxBucketSize = 100)
    assert(uncapped.count() == 190) // 20 choose 2
  }
}
