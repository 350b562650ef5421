package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("mergePair is greedy left-to-right (overlaps resume after the merge)") {
    val df = Seq(Tuple1(Seq("a", "a", "a"))).toDF("s")
    val out = df.select(Bpe.mergeColumn(col("s"), "a", "a")).as[Seq[String]].head()
    assert(out == Seq("aa", "a"))
    val df2 = Seq(Tuple1(Seq("x", "a", "b", "a", "b", "y"))).toDF("s")
    val out2 = df2.select(Bpe.mergeColumn(col("s"), "a", "b")).as[Seq[String]].head()
    assert(out2 == Seq("x", "ab", "ab", "y"))
    // boundary safety: 'xa' + 'b' must NOT merge as (a, b)
    val df3 = Seq(Tuple1(Seq("xa", "b"))).toDF("s")
    assert(df3.select(Bpe.mergeColumn(col("s"), "a", "b")).as[Seq[String]].head()
      == Seq("xa", "b"))
  }

  test("trainBpe learns the classic merge sequence with deterministic tie-breaks") {
    // Sennrich-style vocabulary: low x5, lower x2, newest x6, widest x3
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest"
    ).toDF("text")
    val merges = Bpe.trainBpe(docs, "text", numMerges = 3)
      .select("round", "left", "right", "merged", "pair_count")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    // round 1: es and st tie at 9 -> (e, s) wins lexicographically
    assert(merges(0) == ((1L, "e", "s", "es", 9L)))
    // round 2: (es, t) at 9
    assert(merges(1) == ((2L, "es", "t", "est", 9L)))
    // round 3: lo and ow tie at 7 -> (l, o)
    assert(merges(2) == ((3L, "l", "o", "lo", 7L)))
  }

  test("batched training applies the round's top pairs sequentially in rank order") {
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest"
    ).toDF("text")
    // round-start counts: es 9, st 9, we 8, lo 7, ow 7 ... batch=3 takes
    // (e,s), (s,t), (w,e) at their ROUND-START counts and applies in that
    // order: (e,s) consumes every (s,t) occurrence, so merge 2 is recorded
    // but vacuous — the documented batched-BPE deviation from classic.
    val merges = Bpe.trainBpe(docs, "text", numMerges = 3, batch = 3)
      .select("round", "left", "right", "merged", "pair_count")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(merges(0) == ((1L, "e", "s", "es", 9L)))
    assert(merges(1) == ((2L, "s", "t", "st", 9L)))
    assert(merges(2) == ((3L, "w", "e", "we", 8L)))
    // batch=1 stays exactly classic (the sibling test's sequence)
    val classic = Bpe.trainBpe(docs, "text", numMerges = 3, batch = 1)
      .select("left", "right").as[(String, String)].collect().sortBy(_._1)
    assert(classic.toSet == Set(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("encodeCorpus tokenizes each doc with the learned merges") {
    val docs = Seq(
      (1L, "low low lowest"),
      (2L, "west west"),
      (3L, "q")
    ).toDF("doc_id", "text")
    // hand-derived merges on this vocabulary: (e,s)->es, (es,t)->est, (l,o)->lo
    val merges = Seq(Bpe.Merge(1, "e", "s", 0L), Bpe.Merge(2, "es", "t", 0L),
      Bpe.Merge(3, "l", "o", 0L))
    val got = Bpe.encodeCorpus(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // low -> [lo,w] (2), lowest -> [lo,w,est] (3), west -> [w,est] (2), q -> [q] (1)
    assert(got(0) == ((1L, 3L, 7L, 1714285L))) // 12 chars / 7 tokens
    assert(got(1) == ((2L, 2L, 4L, 2000000L))) //  8 chars / 4 tokens
    assert(got(2) == ((3L, 1L, 1L, 1000000L)))
  }

  test("training stops early when no pairs remain") {
    val docs = Seq("a a a", "b").toDF("text")
    // single-char words only: round 1 has no adjacent pairs at all
    val merges = Bpe.trainBpe(docs, "text", numMerges = 5)
    assert(merges.count() == 0)
  }

  test("a short batch consumes its full round-number budget (fixed schedule)") {
    // one word "abc": round 1 (batch = 3) finds only 2 candidate pairs —
    // (a,b) then (b,c), the latter a no-op after a+b merges. The fixed
    // schedule still burns all 3 round numbers, so the next round's merge
    // (ab,c) lands at round 4, exactly where a static replay of the
    // schedule (the DuckDB oracle's sentinel folds) puts it.
    val docs = Seq("abc").toDF("text")
    val merges = Bpe.trainBpe(docs, "text", numMerges = 4, batch = 3)
      .select("round", "left", "right", "pair_count")
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(merges == Seq((1L, "a", "b", 1L), (2L, "b", "c", 1L), (4L, "ab", "c", 1L)))
  }

  test("the merge expression is codegen (no interpreted fallback)") {
    val df = spark.range(4).select(split(concat(lit("ab"),
      col("id").cast("string")), "").as("s"))
      .select(Bpe.mergeColumn(col("s"), "a", "b").as("m"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
