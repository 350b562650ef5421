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
}
