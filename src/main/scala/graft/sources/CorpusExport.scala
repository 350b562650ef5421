package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.{Sampling, TextStats}

/** Training-shard EXPORT: the hand-off artifact at the end of a corpus
  * pipeline — documents written as JSONL shards a tokenizer/training job
  * consumes, plus a MANIFEST that lets the consumer verify what it read.
  *
  * Shard assignment is the salted hash bucket ([[Sampling.hashBucket]]):
  * deterministic, append-stable, layout-independent — re-running the
  * export after adding documents only appends to shards, it never moves an
  * existing document to a different shard (a tokenizer cache keyed on
  * shard content stays warm). The manifest carries per-shard counts, token
  * mass, and a content signature an external engine can recompute (sum of
  * 32-bit document fingerprints mod 2^32 — order-free, so parallel readers
  * verify without sorting).
  *
  * Scale shape: assignment is per-row codegen; the write is one shuffle on
  * the shard key (`repartition(shard)` keeps one writer task per shard so
  * each shard is one file, the shape training loaders want); the manifest
  * is one aggregation over the same key. Shard count bounds file size:
  * pick nShards ~ corpusBytes / targetShardBytes.
  */
object CorpusExport {

  /** Deterministic shard for a document id — salted so shard placement is
    * independent of the split/sample/mix decisions on the same ids.
    */
  def shardOf(idCol: Column, nShards: Int): Column =
    Sampling.hashBucket(concat(idCol.cast("string"), lit(":shard")), nShards)

  /** Per-shard manifest: document count, token mass, and the order-free
    * content signature (sum of per-doc 32-bit fingerprints mod 2^32; a
    * bigint sum overflows only past 2^31 docs per shard). Pure frame
    * transform — registered as an oracle-checked query.
    */
  def manifest(docs: DataFrame, idCol: String, textCol: String,
               nShards: Int): DataFrame =
    docs
      .groupBy(shardOf(col(idCol), nShards).as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextStats.bpeishTokenCount(col(textCol)).cast("bigint")).as("n_tokens"),
        pmod(sum(TextStats.fingerprint(col(textCol))), lit(4294967296L)).as("content_sig"))

  /** Write `docs` as JSONL shards under `path` (one directory per shard,
    * one file per shard) and return the manifest of what was written. The
    * manifest aggregates the SAME frame the writer consumed, so a reader
    * diffing it against [[manifest]] of the read-back data proves the
    * export complete.
    */
  def exportJsonlShards(docs: DataFrame, idCol: String, textCol: String,
                        path: String, nShards: Int,
                        compression: String = "none"): DataFrame = {
    val withShard = docs.withColumn("shard", shardOf(col(idCol), nShards))
    withShard
      .repartition(nShards, col("shard"))
      .write.partitionBy("shard").mode("overwrite")
      // gzip/lz4/zstd ride Spark's codec option (zstd needs the native
      // Hadoop codec on the cluster): shard files come out as
      // part-*.json.gz etc., and spark.read.json decodes them by extension
      .option("compression", compression)
      .json(path)
    manifest(docs, idCol, textCol, nShards)
  }
}
