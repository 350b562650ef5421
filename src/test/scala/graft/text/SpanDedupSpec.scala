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
