package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private val ids = spark.range(0, 2000).toDF("id")

  test("split is deterministic, reshuffle-stable, and ~80/10/10") {
    val a = ids.select(col("id"), Sampling.split(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    val b = ids.repartition(7).select(col("id"), Sampling.split(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(a == b) // partition-order independent, unlike rand()
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05)
    assert(math.abs(frac("validation") - 0.1) < 0.03)
    assert(math.abs(frac("test") - 0.1) < 0.03)
  }

  test("split assignment is append-stable: a subset keeps its labels") {
    val full = ids.select(col("id"), Sampling.split(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    val subset = ids.where(col("id") < 500)
      .select(col("id"), Sampling.split(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(subset.forall { case (k, v) => full(k) == v })
  }

  test("stratifiedKeep applies per-stratum rates") {
    val df = ids.withColumn("lang",
      when(col("id") % 2 === 0, "en").otherwise("fr"))
    val kept = df.select(col("lang"),
        Sampling.stratifiedKeep(col("id"), col("lang"),
          Map("en" -> 500, "fr" -> 100), defaultPerMille = 0).as("keep"))
      .groupBy("lang").agg(avg(col("keep").cast("double")).as("rate"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(kept("en") - 0.5) < 0.07)
    assert(math.abs(kept("fr") - 0.1) < 0.05)
  }

  test("mixToBudget derives capped and subsampled rates from token mass") {
    // en: 100 docs x 10 tokens = 1000 tokens; fr: 50 x 10 = 500 tokens
    val docs = spark.range(0, 150).toDF("id")
      .withColumn("lang", when(col("id") < 100, "en").otherwise("fr"))
      .withColumn("n_tok", lit(10L))
    // budget 1000, weights en=400 fr=600: en target 400 -> rate 400;
    // fr target 600 > its 500 mass -> rate caps at 1000 (keep everything)
    val out = Sampling.mixToBudget(docs, "id", "lang", col("n_tok"),
      Map("en" -> 400, "fr" -> 600), budgetTokens = 1000L)
    val rates = out.select("lang", "rate_permille").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates == Map("en" -> 400L, "fr" -> 1000L))
    val kept = out.groupBy("lang").agg(avg(col("keep").cast("double")).as("f"))
      .as[(String, Double)].collect().toMap
    assert(kept("fr") == 1.0)           // capped stratum keeps every row
    assert(math.abs(kept("en") - 0.4) < 0.15)
    // deterministic: the decision survives a repartition
    val again = Sampling.mixToBudget(docs.repartition(7), "id", "lang",
      col("n_tok"), Map("en" -> 400, "fr" -> 600), budgetTokens = 1000L)
    assert(rows(out.select("id", "keep")) == rows(again.select("id", "keep")))
  }

  test("percentileGate keeps exactly the mass above the quantile threshold") {
    val docs = spark.range(0, 1000).toDF("doc_id")
      .withColumn("s", (col("doc_id") % 100).cast("double"))
    val out = Sampling.percentileGate(docs, "doc_id", col("s"), quantilePerMille = 250)
    val kept = out.where(col("keep")).count()
    // scores 0..99 uniform: p25 = 24.75, keep s >= 24.75 -> s in 25..99
    assert(kept == 750L)
    val th = out.select("threshold").distinct().as[Double].head()
    assert(th == 24.75)
    // boundary: a score exactly AT the threshold keeps (>=)
    val exact = Sampling.percentileGate(
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 5.0)).toDF("doc_id", "s"),
      "doc_id", col("s"), 500)
    assert(exact.where(col("keep")).count() == 3L) // 3.0 is p50, kept
    // approx production path: same call shape, threshold within sketch
    // tolerance of exact, kept mass close to the 750 exact keeps
    val approx = Sampling.percentileGate(docs, "doc_id", col("s"),
      quantilePerMille = 250, exact = false)
    val thA = approx.select("threshold").distinct().as[Double].head()
    assert(math.abs(thA - 24.75) <= 2.0)
    assert(math.abs(approx.where(col("keep")).count() - 750L) <= 30L)
  }

  test("temperatureMix flattens shares: minority stratum oversampled vs its mass") {
    // en: 900 docs x 10 tokens = 9000; fr: 100 x 10 = 1000 (10% share)
    val docs = spark.range(0, 1000).toDF("id")
      .withColumn("lang", when(col("id") < 900, "en").otherwise("fr"))
      .withColumn("n_tok", lit(10L))
    val out = Sampling.temperatureMix(docs, "id", "lang", col("n_tok"),
      budgetTokens = 2000L)
    val rates = out.select("lang", "rate_permille").distinct()
      .as[(String, Long)].collect().toMap
    // sqrt weights: sq(9000):sq(1000) = 3:1 -> integer-floored targets
    // 1499/499 -> en rate 166‰, fr rate 499‰ — the minority stratum's
    // KEEP RATE is ~3x the majority's (temperature flattening), where a
    // proportional sampler would give both 200‰.
    assert(rates == Map("en" -> 166L, "fr" -> 499L))
    // deterministic under repartitioning
    val again = Sampling.temperatureMix(docs.repartition(7), "id", "lang",
      col("n_tok"), budgetTokens = 2000L)
    assert(rows(out.select("id", "keep")) == rows(again.select("id", "keep")))
  }

  test("temperatureMix treats the null stratum as its own group, dropping no rows") {
    // equal token mass -> equal sqrt shares: each stratum targets half the
    // budget; with no weights map, null ("unknown") is a first-class stratum
    val docs = Seq((1L, "en"), (2L, null)).toDF("id", "lang")
      .withColumn("n_tok", lit(10L))
    val out = Sampling.temperatureMix(docs, "id", "lang", col("n_tok"), 10L)
    assert(out.count() == 2)
    val r2 = out.where(col("id") === 2).select("rate_permille")
      .as[Long].collect().toSeq
    assert(r2 == Seq(500L))
  }

  test("mixToBudget emits null/unweighted strata at rate 0 instead of dropping them") {
    val docs = Seq((1L, "en"), (2L, null), (3L, "xx")).toDF("id", "lang")
      .withColumn("n_tok", lit(10L))
    val out = Sampling.mixToBudget(docs, "id", "lang", col("n_tok"),
        Map("en" -> 1000), budgetTokens = 100L)
      .select("id", "rate_permille", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // no rows lost
    assert(out(0)._2 == 1000L)          // en: target 100 >= mass 10 -> capped
    assert(out(1)._2 == 0L && !out(1)._3) // null stratum: rate 0, kept row
    assert(out(2)._2 == 0L && !out(2)._3) // unweighted stratum: rate 0
  }

  test("mixToBudget decisions are independent of split decisions (salted)") {
    val docs = spark.range(0, 2000).toDF("id").withColumn("lang", lit("en"))
      .withColumn("n_tok", lit(10L))
    // rate 500 via budget = half the token mass
    val out = Sampling.mixToBudget(docs, "id", "lang", col("n_tok"),
      Map("en" -> 1000), budgetTokens = 10000L)
      .withColumn("bucket", Sampling.hashBucket(col("id"), 1000))
    // were mixing keyed on the UNsalted bucket, keep would be exactly
    // (bucket < 500); the salt decorrelates the two decisions
    val agree = out.where((col("bucket") < 500) === col("keep")).count()
    assert(math.abs(agree / 2000.0 - 0.5) < 0.1)
  }

  test("shuffleKey is deterministic, epoch-independent, and range-balanced") {
    val keyed = ids.select(col("id"),
      Sampling.shuffleKey(col("id")).as("k1"),
      Sampling.shuffleKey(col("id"), "epoch2").as("k2"))
    val a = keyed.as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = ids.repartition(7).select(col("id"),
        Sampling.shuffleKey(col("id")).as("k1"),
        Sampling.shuffleKey(col("id"), "epoch2").as("k2"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq) // stable across physical layouts
    // the two epochs order the corpus differently
    assert(a.sortBy(_._2).map(_._1).toSeq != a.sortBy(_._3).map(_._1).toSeq)
    // near-uniform over the key range: each decile holds ~10% of rows
    val decile = math.ceil(2147483647.0 / 10).toLong
    val byDecile = a.groupBy(_._2 / decile).view.mapValues(_.size).toMap
    assert(byDecile.size == 10 && byDecile.values.forall(n => n > 120 && n < 280))
    // the scale pattern: repartitionByRange on the key balances partitions
    val sizes = keyed.repartitionByRange(8, col("k1"))
      .groupBy(spark_partition_id()).count().as[(Int, Long)].collect().map(_._2)
    assert(sizes.length == 8 && sizes.forall(n => n > 100 && n < 500))
  }

  test("sampleExactly returns exactly n rows, stable across layouts, and plans a top-n") {
    val a = Sampling.sampleExactly(ids, "id", 150).as[Long].collect().toSet
    val b = Sampling.sampleExactly(ids.repartition(13), "id", 150).as[Long].collect().toSet
    assert(a.size == 150 && a == b)
    // a different seed draws a different sample
    val c = Sampling.sampleExactly(ids, "id", 150, seed = "v2").as[Long].collect().toSet
    assert(a != c)
    // top-n plan, not a global sort
    val p = Sampling.sampleExactly(ids, "id", 150).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("quotaCap keeps at most k per stratum, deterministically") {
    val df = ids.withColumn("dom", (col("id") % 4).cast("string"))
    val out = Sampling.quotaCap(df, "id", "dom", k = 7)
    val kept = out.where(col("keep")).groupBy("dom").count()
      .as[(String, Long)].collect().toMap
    assert(kept.values.forall(_ == 7L) && kept.size == 4)
    assert(out.count() == 2000) // every row emitted, flag only
    val again = Sampling.quotaCap(df.repartition(11), "id", "dom", k = 7)
      .where(col("keep")).select("id").as[Long].collect().toSet
    assert(again == out.where(col("keep")).select("id").as[Long].collect().toSet)
  }

  test("sublinearClusterSample keeps ceil(n^alpha) per cluster, deterministically") {
    // clusters of 1, 2, 4, 9 identical texts -> sqrt keeps 1, 2, 2, 3
    val docs = (Seq((1L, "solo")) ++
      (10L to 11L).map(i => (i, "pair")) ++
      (20L to 23L).map(i => (i, "quad")) ++
      (30L to 38L).map(i => (i, "nine"))).toDF("doc_id", "text")
    val out = Sampling.sublinearClusterSample(docs, "doc_id", "text")
      .as[(Long, String, Long, Boolean)].collect()
    val byText = out.groupBy(_._2)
    assert(byText("solo").map(r => (r._3, r._4)).toSeq == Seq((1L, true)))
    assert(byText("pair").count(_._4) == 2)  // ceil(sqrt(2)) = 2: both kept
    assert(byText("quad").count(_._4) == 2)  // ceil(sqrt(4)) = 2
    assert(byText("nine").count(_._4) == 3)  // ceil(sqrt(9)) = 3
    assert(out.forall { case (_, t, sz, _) => sz == byText(t).length })
    // alpha extremes: 0 = hard exact-dedup (one keeper), 1 = keep all
    val hard = Sampling.sublinearClusterSample(docs, "doc_id", "text", alpha = 0)
      .as[(Long, String, Long, Boolean)].collect()
    assert(hard.groupBy(_._2).values.forall(_.count(_._4) == 1))
    val all = Sampling.sublinearClusterSample(docs, "doc_id", "text", alpha = 1)
      .as[(Long, String, Long, Boolean)].collect()
    assert(all.forall(_._4))
    // keeper choice is layout-stable
    val again = Sampling.sublinearClusterSample(docs.repartition(7), "doc_id", "text")
      .as[(Long, String, Long, Boolean)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("tfidfTopTerms ranks distinctive terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common zebra common common"),
      (2L, "common words only here"),
      (3L, "common words again today")).toDF("doc_id", "text")
    val out = TextStats.tfidfTopTerms(docs, "doc_id", "text", 2)
      .where(col("doc_id") === 1).orderBy("rank")
      .select("term").as[String].collect().toSeq
    // "zebra" (df=1) outranks "common" (df=3) despite tf 1 vs 3:
    // 1*(4/2)=2.0 == 3*(4/4)=3.0 -> actually tf wins here; assert both
    // appear and the scores are the rational form
    assert(out.toSet == Set("zebra", "common"))
    val scores = TextStats.tfidfTopTerms(docs, "doc_id", "text", 2)
      .where(col("doc_id") === 1)
      .select("term", "tfidf").as[(String, Double)].collect().toMap
    assert(scores("common") == 3.0) // tf 3 * (3+1)/(3+1)
    assert(scores("zebra") == 2.0)  // tf 1 * (3+1)/(1+1)
  }

  test("piiColumns detect and mask emails and long digit runs") {
    val docs = Seq(
      (1L, "reach me at jane.doe+x@mail.example.org or on 0123456789 thanks"),
      (2L, "no pii here, just 1234 short digits")).toDF("doc_id", "text")
    val cols = col("doc_id") +: TextStats.piiColumns(col("text")).map { case (n, c) => c.as(n) }
    val out = docs.select(cols: _*).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L)._1 == 1L && out(1L)._2 == 1L)
    assert(out(2L)._1 == 0L && out(2L)._2 == 0L)
    // masked hash of doc 1 equals the hash of the hand-masked text
    val expected = docs.sparkSession.range(1).select(
      sha2(lit("reach me at [EMAIL] or on [NUMBER] thanks").cast("binary"), 256)).head().getString(0)
    assert(out(1L)._3 == expected)
  }

  test("nearDupKeepBest keeps the highest-quality copy per cluster") {
    val corpus = Seq(
      // cluster {1, 2}: same content, doc 2 has garbage appended digits
      // that lower its alpha ratio -> doc 1 must win despite higher id order
      (2L, "the quick brown fox jumps over the lazy dog tonight 0x#!%"),
      (1L, "the quick brown fox jumps over the lazy dog tonight indeed"),
      (3L, "completely different text about nothing in particular today")
    ).toDF("doc_id", "text")
    val q = TextStats.qualityColumns(col("text")).toMap.apply("quality_score")
    val out = Dedup.nearDupKeepBest(corpus, "doc_id", "text", q, 3, 0.5)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 == out(2L)._1)          // same cluster
    assert(out(1L)._2 && !out(2L)._2)         // quality argmax wins
    assert(out(3L)._2)                         // singleton keeps itself
  }

  test("packSequences packs in id order with start-offset boundary rule") {
    import org.apache.spark.sql.functions.lit
    // single bucket: budget 10; token counts 4,4,4,15,4 ->
    //   cum_before 0,4,8,12,27 -> seq 0,0,0,1,2
    // doc 3 (cum_before 8) STARTS in seq 0 even though it overruns;
    // doc 4 (15 > budget) gets its own sequence
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 15L), (5L, 4L))
      .toDF("doc_id", "n")
    val out = Sampling.packSequences(docs, "doc_id", col("n") * lit(1),
        budget = 10L, nBuckets = 1)
      .select("doc_id", "seq").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
    // multi-bucket: every doc keeps its bucket under appends (pure hash)
    val big = (1L to 200L).map((_, 7L)).toDF("doc_id", "n")
    val b1 = Sampling.packSequences(big, "doc_id", col("n"), 100L, 8)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    val b2 = Sampling.packSequences(big.where("doc_id <= 100"), "doc_id", col("n"), 100L, 8)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    assert(b2.forall { case (id, b) => b1(id) == b })
  }

  test("repetitionColumns flag repetitive docs and ignore short ones") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),     // one distinct 2-gram
      (2L, "a perfectly normal sentence with no repeats at all"),
      (3L, "one")                                 // too short for 2-grams
    ).toDF("doc_id", "text")
    val cols = col("doc_id") +: TextStats.repetitionColumns(col("text")).map { case (n, c) => c.as(n) }
    val out = docs.select(cols: _*).as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (0.8, 0.75)) // 5 bigram slots, 1 distinct; 4 trigram slots, 1 distinct
    assert(out(2L) == (0.0, 0.0))
    assert(out(3L) == (0.0, 0.0))
  }
}
