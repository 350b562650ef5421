package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  // doc 1 and 2 share a 6-token run ("one two three four five six") in
  // different positions; doc 3 is an exact clone of doc 1; doc 4 repeats a
  // 4-gram internally; doc 5 is unrelated; doc 6 is too short for any
  // 4-window.
  private val corpus = Seq(
    (1L, "alpha one two three four five six beta gamma delta epsilon zeta"),
    (2L, "prefix words here one two three four five six suffix tail words"),
    (3L, "alpha one two three four five six beta gamma delta epsilon zeta"),
    (4L, "x y z w q x y z w q r s"),
    (5L, "completely unrelated sentence with no shared windows anywhere at all"),
    (6L, "tiny doc")
  ).toDF("doc_id", "text")

  test("dupSpans finds maximal cross-doc spans with exact boundaries") {
    val spans = SpanDedup.dupSpans(corpus, "doc_id", "text", k = 4, minTokens = 6)
      .select("doc_id", "span_start", "span_end", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    // docs 1/3 duplicate entirely (12 tokens, positions 0..11); doc 2's
    // shared run is tokens 3..8 (6 tokens).
    assert(spans.contains((1L, 0L, 11L, 12L)))
    assert(spans.contains((3L, 0L, 11L, 12L)))
    assert(spans.contains((2L, 3L, 8L, 6L)))
    assert(!spans.exists(_._1 == 5L) && !spans.exists(_._1 == 6L))
  }

  test("dupSpans sees within-doc repetition too") {
    val spans = SpanDedup.dupSpans(corpus.where(col("doc_id") === 4), "doc_id",
      "text", k = 4, minTokens = 4)
      .select("doc_id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().toSet
    // "x y z w q" at 0..4 and 5..9: windows 0,1 (starts of 'x y z w' and
    // 'y z w q') repeat at 5,6 — islands [0,1]+3 and [5,6]+3.
    assert(spans == Set((4L, 0L, 4L), (4L, 5L, 9L)))
  }

  test("stripDupSpans keeps the globally-first occurrence and reassembles in order") {
    val out = SpanDedup.stripDupSpans(corpus, "doc_id", "text", k = 4)
      .select("doc_id", "clean_text", "n_dropped")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 1 is the first occurrence of everything it contains: unchanged.
    assert(out(1L) == ("alpha one two three four five six beta gamma delta epsilon zeta", 0L))
    // doc 3 (clone of doc 1, higher id) loses its entire text.
    assert(out(3L) == ("", 12L))
    // doc 2 loses exactly the shared 6-token run, keeping its own words.
    assert(out(2L) == ("prefix words here suffix tail words", 6L))
    // docs 5 and 6 are untouched.
    assert(out(5L)._2 == 0L && out(6L) == ("tiny doc", 0L))
  }

  test("whitespace runs collapse before windowing (one tokenizer for both sides)") {
    val messy = Seq(
      (1L, "a  b\tc   one two three four five"),
      (2L, "unrelated one two three four five  end")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.dupSpans(messy, "doc_id", "text", k = 4, minTokens = 5)
      .select("doc_id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().toSet
    // after \s+ collapse doc 1 tokens are a b c one two three four five:
    // shared run at 3..7; doc 2's at 1..5.
    assert(spans == Set((1L, 3L, 7L), (2L, 1L, 5L)))
  }

  test("phraseMatches finds token-boundary occurrences with counts and positions") {
    val df = Seq(
      (1L, "the table hash join and the table hash again"),
      (2L, "a table hashed row"), // substring but not token match
      (3L, "unrelated text entirely"),
      (4L, "table hash")
    ).toDF("doc_id", "text")
    val out = SpanDedup.phraseMatches(df, "doc_id", "text", "table hash")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map(1L -> ((2L, 1L)), 4L -> ((1L, 0L))))
    // single-token phrase goes through the no-window lane
    val one = SpanDedup.phraseMatches(df, "doc_id", "text", "table")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(one == Map(1L -> 2L, 2L -> 1L, 4L -> 1L))
  }

  test("winnow honors the shared-run guarantee and the density bound") {
    // docs 1 and 2 share an 8-token run (>= window + k - 1 = 5 + 4 - 1):
    // the winnowing guarantee says they must share a fingerprint VALUE.
    val docs = Seq(
      (1L, "aa bb cc one two three four five six seven eight dd ee ff gg hh"),
      (2L, "zz yy one two three four five six seven eight xx ww vv uu tt ss"),
      (3L, "totally different content with no overlap to the others at all ok")
    ).toDF("doc_id", "text")
    val fps = SpanDedup.winnow(docs, "doc_id", "text", k = 4, window = 5)
      .as[(Long, Long, Long)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
    // density: every full window contributes a selection, selections are
    // distinct-per-doc, so n_windows/window <= |fps| <= n_windows
    val nWindows = 16 - 4 + 1 - 5 + 1 // tokens - k + 1 kgrams, - w + 1 windows
    Seq(1L, 2L, 3L).foreach { id =>
      assert(byDoc(id).size <= nWindows && fps.count(_._1 == id) >= nWindows / 5)
    }
    // selected positions are valid k-gram starts
    assert(fps.forall(f => f._2 >= 0 && f._2 <= 16 - 4))
  }

  test("winnow breaks hash ties by the rightmost position") {
    // identical k-grams tie on hash; within one window the RIGHTMOST of
    // the tied minima must win. "a a a a a a a a a a" has one distinct
    // 4-gram ("a a a a", 7 occurrences) — every window min is that hash,
    // selected at each window's LAST position: pos 4, 5, 6 (3 windows).
    val docs = Seq((1L, "a a a a a a a a a a")).toDF("doc_id", "text")
    val fps = SpanDedup.winnow(docs, "doc_id", "text", k = 4, window = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(fps.map(_._2).toSeq == Seq(4L, 5L, 6L))
    assert(fps.map(_._3).distinct.length == 1)
  }

  test("winnowNearDup pairs docs by shared fingerprint values, not boilerplate") {
    // 1/2 share an 8-token run (two+ shared fingerprints expected at
    // minShared=1..2); 3 is a clone of 1; 4 shares nothing.
    val docs = Seq(
      (1L, "aa bb cc one two three four five six seven eight dd ee ff gg hh"),
      (2L, "zz yy one two three four five six seven eight xx ww vv uu tt ss"),
      (3L, "aa bb cc one two three four five six seven eight dd ee ff gg hh"),
      (4L, "totally different content with no overlap to the others at all ok")
    ).toDF("doc_id", "text")
    // the guarantee is >= 1 shared fingerprint per shared run of
    // window+k-1 tokens, so detect at minShared = 1.
    val pairs = SpanDedup.winnowNearDup(docs, "doc_id", "text",
        k = 4, window = 5, minShared = 1)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // the clone pair shares every fingerprint; strictly more than the
    // partial-overlap pairs.
    assert(pairs((1L, 3L)) > pairs((1L, 2L)) && pairs((1L, 2L)) == pairs((2L, 3L)))
    // a tight bucket cap drops ALL pairs (every fp bucket here has >= 2
    // members only via these docs; cap=1 excludes everything) — the gate
    // engages rather than degrading to a cross join.
    assert(SpanDedup.winnowNearDup(docs, "doc_id", "text",
      k = 4, window = 5, minShared = 1, maxBucketSize = 1).count() == 0L)
  }

  test("fully-covered documents still appear in strip output with empty text") {
    val dupOnly = Seq(
      (1L, "p q r s"),
      (2L, "p q r s")
    ).toDF("doc_id", "text")
    val out = SpanDedup.stripDupSpans(dupOnly, "doc_id", "text", k = 4)
      .select("doc_id", "clean_text", "n_tokens", "n_dropped")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out == Set((1L, "p q r s", 4L, 0L), (2L, "", 0L, 4L)))
  }
}
