package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {

  import spark.implicits._

  // target docs speak "alpha beta"; raw background speaks "noise junk"
  private val corpus = Seq(
    (1L, "alpha beta alpha beta alpha beta", "tgt"),
    (2L, "alpha beta alpha beta gamma", "tgt"),
    (3L, "noise junk noise junk noise junk", "raw"),
    (4L, "alpha beta alpha beta noise junk", "raw"),
    (5L, "one", "raw") // single token: no bigrams
  ).toDF("doc_id", "text", "source")

  test("dsirWeights ranks target-like docs above background-like docs") {
    val out = Importance.dsirWeights(corpus, "doc_id", "text",
        col("source") === "tgt", buckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // every doc present, bigram counts exact
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out(1L)._1 == 5L && out(2L)._1 == 4L && out(5L)._1 == 0L)
    // no-bigram doc scores exactly 0
    assert(out(5L)._2 == 0L)
    // "alpha beta"-heavy docs outscore "noise junk"-heavy docs, and the
    // pure target doc beats the mixed doc which beats the pure background
    assert(out(1L)._2 > out(4L)._2 && out(4L)._2 > out(3L)._2)
  }

  test("dsirWeights per-bigram contributions are additive integer micro-nats") {
    // doc 1's score is 5 bigram occurrences of exactly two features
    // ("alpha beta" x3, "beta alpha" x2) — rerunning on a corpus where the
    // same features have the same global counts reproduces the exact sum.
    val out = Importance.dsirWeights(corpus, "doc_id", "text",
        col("source") === "tgt", buckets = 64)
      .as[(Long, Long, Long)].collect()
    val again = Importance.dsirWeights(corpus, "doc_id", "text",
        col("source") === "tgt", buckets = 64)
      .as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("zipfFit recovers a near -1 slope on an exact Zipf corpus") {
    // token k appears floor(1200 / rank) times: exact Zipf with slope -1
    val text = (1 to 30).flatMap(r => Seq.fill(1200 / r)(s"w$r")).mkString(" ")
    val out = TextStats.zipfFit(Seq(text).toDF("text"), "text", topK = 30)
      .as[(Long, Long, Long)].head()
    assert(out._1 == 30L)
    // floor() quantization keeps the fit within a few percent of -1
    assert(out._2 > -1100000L && out._2 < -900000L, s"slope was ${out._2}")
    // intercept ~ ln(1200) * 1e6 ~ 7.09e6
    assert(out._3 > 6500000L && out._3 < 7700000L, s"intercept was ${out._3}")
  }

  test("zipfFit degenerate single-rank corpus yields zero slope") {
    val out = TextStats.zipfFit(Seq("a a a a").toDF("text"), "text", topK = 5)
      .as[(Long, Long, Long)].head()
    // one distinct token -> one (x, y) point -> den = 0 guard engages
    assert(out == ((1L, 0L, 0L)))
  }

  test("distributionShift: identical slices score exactly zero; disjoint vocab scores high") {
    // identical token distributions on both sides: pa == pb in every
    // bucket, each contribution is exactly (0 * ln 1) = 0
    val same = Seq((true, "alpha beta gamma"), (false, "alpha beta gamma"))
      .toDF("l", "text")
    val zero = Importance.distributionShift(same, "text", col("l"))
      .as[(Long, Long)].head()
    assert(zero._1 == 0L && zero._2 > 0L)
    // disjoint vocabularies: strong drift, PSI well above the 0.25
    // action threshold (250000 micro)
    val split = (Seq.fill(100)((true, "aa bb cc dd ee")) ++
      Seq.fill(100)((false, "vv ww xx yy zz"))).toDF("l", "text")
    val high = Importance.distributionShift(split, "text", col("l"))
      .as[(Long, Long)].head()
    assert(high._1 > 250000L, s"psi ${high._1}")
  }

  test("distributionShift fixed vector: exact hand-computed micro-units") {
    // Two token types -> two buckets, counts chosen so the smoothed-PSI
    // arithmetic is checkable by hand (independent of the DuckDB replica
    // oracle, which shares the engine's formula):
    //   left:  alpha x6, beta x1  (na = 7)
    //   right: alpha x1, beta x2  (nb = 3)
    //   p_side(f) = (c+1)/(n+4096); per-bucket floor(1e6*(pa-pb)*ln(pa/pb))
    //   alpha: floor(1e6 * (7/4103 - 2/4099) * ln((7/4103)/(2/4099))) = 1524
    //   beta:  floor(1e6 * (2/4103 - 3/4099) * ln((2/4103)/(3/4099))) = 99
    val docs = Seq(
      (true, "alpha alpha alpha"), (true, "alpha alpha alpha"), (true, "beta"),
      (false, "alpha beta beta")).toDF("l", "text")
    val out = Importance.distributionShift(docs, "text", col("l"))
      .as[(Long, Long)].head()
    assert(out._2 == 2L, s"alpha/beta collided in one bucket: $out")
    assert(out._1 == 1623L, s"psi_micro ${out._1} != hand-computed 1524 + 99")
  }

  test("dsirWeights fixed vector: exact hand-computed LLR micro-nats") {
    // Single-bigram docs -> two buckets with hand-checkable counts:
    //   doc 1 (target)  "a a a" -> bigram "a a" x2
    //   doc 2 (raw)     "a a"   -> bigram "a a" x1
    //   doc 3 (raw)     "b b"   -> bigram "b b" x1
    // bucket(a a): r=3, t=2; bucket(b b): r=1, t=0; rtot=4, ttot=2, B=4096
    //   llr(a a) = floor(1e6*ln((2+1)(4+4096)/((3+1)(2+4096)))) = -287195
    //   llr(b b) = floor(1e6*ln((0+1)(4+4096)/((1+1)(2+4096)))) = -692660
    // dsir(doc) = sum over its bigram OCCURRENCES of its bucket's llr
    val docs = Seq((1L, "a a a"), (2L, "a a"), (3L, "b b")).toDF("doc_id", "text")
    val out = Importance.dsirWeights(docs, "doc_id", "text", col("doc_id") === 1L)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) == ((2L, -574390L)), out(1L))
    assert(out(2L) == ((1L, -287195L)), out(2L))
    assert(out(3L) == ((1L, -692660L)), out(3L))
  }

  test("linearQualityScore fixed vector: literal expected logit") {
    // doc "p q" -> features {uni p, uni q, bi "p q"}; trained weights
    // p -> 300000, q -> -100001, bigram untrained (0):
    //   logit = floor((300000 - 100001 + 0) / 3) = floor(66666.33) = 66666
    val buckets = 4096
    val ids = Seq("p", "q", "p q").toDF("k")
      .select(col("k"), Sampling.hashBucket(col("k"), buckets).as("b"))
      .as[(String, Long)].collect().toMap
    assert(ids.values.toSet.size == 3, s"feature buckets collided: $ids")
    val weights = Seq((ids("p"), 300000L), (ids("q"), -100001L))
      .toDF("bucket", "weight_micro")
    val out = Importance.linearQualityScore(
        Seq((1L, "p q")).toDF("doc_id", "text"), "doc_id", "text",
        weights, buckets, thresholdMicro = 50000L)
      .as[(Long, Long, Long, Boolean)].head()
    assert(out == ((1L, 3L, 66666L, true)), out)
  }

  test("linearQualityScore: floored mean of the matched feature weights, empty docs neutral") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "a")).toDF("doc_id", "text")
    // features: doc1 = {uni a, uni b, bi "a b"}; doc3 = {uni a}; doc2 = none.
    // Weight table built from the ACTUAL bucket ids (grouped in case of a
    // collision) so the test pins the scoring arithmetic, not the hash.
    val buckets = 64
    val keyWeight = Map("a" -> 7L, "b" -> 1L, "a b" -> 1L)
    val ids = keyWeight.keys.toSeq.toDF("k")
      .select(col("k"), Sampling.hashBucket(col("k"), buckets).as("bucket"))
      .as[(String, Long)].collect().toMap
    val byBucket = keyWeight.groupBy { case (k, _) => ids(k) }
      .map { case (b, kw) => (b, kw.values.sum) }
    val weights = byBucket.toSeq.toDF("bucket", "weight_micro")
    val out = Importance.linearQualityScore(docs, "doc_id", "text",
        weights, buckets, thresholdMicro = 4L)
      .as[(Long, Long, Long, Boolean)].collect().map(t => t._1 -> t).toMap
    val d1Logit = math.floor(
      (byBucket(ids("a")) + byBucket(ids("b")) + byBucket(ids("a b"))).toDouble / 3).toLong
    assert(out(1L) == ((1L, 3L, d1Logit, d1Logit >= 4L)))
    assert(out(2L) == ((2L, 0L, 0L, false)))
    assert(out(3L) == ((3L, 1L, byBucket(ids("a")), byBucket(ids("a")) >= 4L)))
  }

  test("linearQualityScore: unmatched buckets weigh zero; negative means floor down") {
    val docs = Seq((1L, "x y z w")).toDF("doc_id", "text") // 4 uni + 3 bi = 7 features
    val empty = Seq.empty[(Long, Long)].toDF("bucket", "weight_micro")
    val none = Importance.linearQualityScore(docs, "doc_id", "text",
        empty, 64, thresholdMicro = 0L)
      .as[(Long, Long, Long, Boolean)].head()
    assert(none == ((1L, 7L, 0L, true)))
    // negative weight on bucket("x"): the mean floors DOWN (-1 for -5/7,
    // never the truncation toward zero). Expected value derived from the
    // actual bucket ids so a hash collision among the 7 features cannot
    // destabilize the assertion.
    val feats = Seq("x", "y", "z", "w", "x y", "y z", "z w")
    val fb = feats.toDF("k").select(Sampling.hashBucket(col("k"), 64))
      .as[Long].collect()
    val neg = Seq((fb.head, -5L)).toDF("bucket", "weight_micro")
    val expect = math.floor(-5.0 * fb.count(_ == fb.head) / 7).toLong
    val out = Importance.linearQualityScore(docs, "doc_id", "text",
        neg, 64, thresholdMicro = 0L)
      .as[(Long, Long, Long, Boolean)].head()
    assert(expect < 0L)
    assert(out == ((1L, 7L, expect, false)))
  }

  test("importanceResample: weight-dominant selection, exact n, reshuffle-stable") {
    import org.apache.spark.sql.functions._
    // 100 low-weight docs (0) and 10 docs with overwhelming weight (+20
    // nats): Gumbel noise spans ~[-1.9, 13.8] micro-scaled, so every
    // high-weight doc MUST be selected before any low-weight one
    val w = spark.range(0, 110).select(col("id").as("doc_id"),
      when(col("id") >= 100, 20000000L).otherwise(0L).as("w_micro"))
    val top = Importance.importanceResample(w, "doc_id", "w_micro", n = 20)
      .as[(Long, Long, Long)].collect()
    assert(top.length == 20)
    val ids = top.map(_._1).toSet
    assert((100L until 110L).forall(ids.contains), s"high-weight docs missing: $ids")
    // deterministic under repartition
    val again = Importance.importanceResample(w.repartition(7), "doc_id", "w_micro", 20)
      .as[(Long, Long, Long)].collect()
    assert(top.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // equal weights: selection is the hash order, n exact
    val eq = Importance.importanceResample(
      w.withColumn("w_micro", lit(0L)), "doc_id", "w_micro", 5)
      .as[(Long, Long, Long)].collect()
    assert(eq.length == 5)
  }
}
