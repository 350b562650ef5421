package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed released-vocabulary (merges.txt format) loading and its merge-chain
  * application — the tokenizer-parity lane: packing budgets must come from
  * the vocabulary the training stack ships, not a corpus-trained one.
  */
class FixedVocabSpec extends SparkSpec {

  test("loadMerges parses merges.txt format: comments skipped, rank = line order") {
    val merges = Bpe.loadMerges(Iterator(
      "#version: 0.2", "t h", "th e", "", "  ", "i n"))
    assert(merges.map(m => (m.round, m.left, m.right)) ==
      Seq((1, "t", "h"), (2, "th", "e"), (3, "i", "n")))
    intercept[IllegalArgumentException](Bpe.loadMerges(Iterator("notapair")))
  }

  test("vendored fixture loads from the classpath and its merges fire on the corpus words") {
    import spark.implicits._
    val merges = Bpe.loadMergesResource("/graft/fixed_merges.txt")
    assert(merges.size >= 48)
    assert(merges.head == Bpe.Merge(1, "t", "h", 0L))
    // whole words the chain is designed to collapse to ONE token, plus
    // out-of-vocabulary words that must stay multi-token
    val docsDf = Seq(
      (1L, "the table value window"),
      (2L, "zzz qqq"),
      (3L, "order query filter merge")).toDF("doc_id", "text")
    val enc = Bpe.encodeCorpus(docsDf, "doc_id", "text", merges)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(enc(1L) == 4L, s"in-vocab words must be 1 token each: ${enc(1L)}")
    assert(enc(3L) == 4L, s"in-vocab words must be 1 token each: ${enc(3L)}")
    assert(enc(2L) == 6L, s"OOV words stay char-tokenized: ${enc(2L)}")
  }
}
