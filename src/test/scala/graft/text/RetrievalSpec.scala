package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark stream x"),
    (2L, "spark y z"),
    (3L, "a b c d"),
    (4L, "stream join vector spark")
  ).toDF("doc_id", "text")

  test("bm25TopK ranks the all-terms doc first and excludes no-term docs") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("spark", "stream", "join", "vector"), 10)
      .as[(Long, Long)].collect()
    assert(out.map(_._1).toSet == Set(1L, 2L, 4L)) // doc 3 has no query term
    assert(out.head._1 == 4L) // matches all four terms
    assert(out.forall(_._2 > 0))
    // more matched terms outranks repeated single term here
    val scores = out.toMap
    assert(scores(4L) > scores(1L) && scores(1L) > scores(2L))
  }

  test("bm25TopK is deterministic under repartitioning") {
    val a = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("spark", "stream"), 10)
      .as[(Long, Long)].collect().toSeq
    val b = Retrieval.bm25TopK(corpus.repartition(7), "doc_id", "text",
      Seq("spark", "stream"), 10).as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("bm25 term frequency saturates (k1 bound): tf component < k1+1") {
    // one doc that is the query term repeated many times: its tf component
    // approaches but never reaches (k1+1) = 2.2 per term
    val d = Seq((1L, Seq.fill(500)("spark").mkString(" ")),
      (2L, "spark other words here")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, "doc_id", "text", Seq("spark"), 10)
      .as[(Long, Long)].collect().toMap
    // idf_milli is shared; component ratio bounded by 2200/1000
    assert(out(1L) > out(2L))
    assert(out(1L).toDouble / out(2L) < 2200.0 / 400.0)
  }

  test("heavyHitters equals the naive exact count above threshold") {
    val docs = Seq(
      (1L, "a a a b c"), (2L, "a a a a b"), (3L, "a a b d e"), (4L, "x y z a a")
    ).toDF("doc_id", "text")
    val hh = Retrieval.heavyHitters(docs, "text", threshold = 4L, buckets = 64)
      .as[(String, Long)].collect().toMap
    val naive = docs.select(explode(split(col("text"), "\\s+")).as("t"))
      .groupBy("t").count().where(col("count") >= 4)
      .as[(String, Long)].collect().toMap
    assert(hh == naive)
    assert(hh == Map("a" -> 11L)) // "b" totals 3, below the threshold
  }

  test("heavyHitters exactness survives bucket collisions (buckets = 1)") {
    // every token in one bucket: the sketch prunes nothing, output stays exact
    val docs = Seq((1L, "p p p q q r")).toDF("doc_id", "text")
    val hh = Retrieval.heavyHitters(docs, "text", threshold = 2L, buckets = 1)
      .as[(String, Long)].collect().toMap
    assert(hh == Map("p" -> 3L, "q" -> 2L))
  }
}
