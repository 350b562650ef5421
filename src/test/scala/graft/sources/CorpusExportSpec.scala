package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusExportSpec extends SparkSpec {

  import spark.implicits._

  private val docs = (0L until 200L).map(i => (i, s"doc $i body word$i"))
    .toDF("doc_id", "text")

  test("exportJsonlShards writes one JSONL file per shard and round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    val m = CorpusExport.exportJsonlShards(docs, "doc_id", "text", dir, nShards = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(m.map(_._1).toSeq == (0L until 8L)) // every shard populated
    assert(m.map(_._2).sum == 200)
    // one data file per shard directory (repartition(shard) -> one writer)
    val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == 8)
    assert(shardDirs.forall(_.listFiles().count(_.getName.endsWith(".json")) == 1))
    // the read-back corpus carries the same docs and recomputes the SAME
    // manifest — count, token mass, and content signature all survive
    val back = spark.read.json(dir).select(col("doc_id"), col("text"))
    val m2 = CorpusExport.manifest(back, "doc_id", "text", 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(m2.toSeq == m.toSeq)
  }

  test("shard assignment is append-stable: new docs never move old ones") {
    val half = docs.where(col("doc_id") < 100)
    val a = half.select(col("doc_id"), CorpusExport.shardOf(col("doc_id"), 8).as("s"))
      .as[(Long, Long)].collect().toMap
    val b = docs.select(col("doc_id"), CorpusExport.shardOf(col("doc_id"), 8).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(a.forall { case (k, v) => b(k) == v })
  }

  test("compressed export round-trips and writes compressed shard files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export_gz_").toString
    // gzip in this container's Hadoop; zstd/lz4 ride the same option where
    // the native codec is present
    val m = CorpusExport.exportJsonlShards(docs, "doc_id", "text", dir,
      nShards = 4, compression = "gzip")
    assert(m.count() == 4)
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getName).filter(_.startsWith("part-"))
    assert(files.nonEmpty && files.forall(_.endsWith(".json.gz")), files.mkString(","))
    val back = spark.read.json(dir)
    assert(back.count() == docs.count())
    // the consumer-side proof: manifest of the read-back equals the writer's
    val m2 = CorpusExport.manifest(
      back.select(col("doc_id").cast("long").as("doc_id"), col("text")),
      "doc_id", "text", 4)
    assert(rows(m) == rows(m2))
  }

  test("manifest signature detects a corrupted document") {
    val m = CorpusExport.manifest(docs, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val corrupted = docs.withColumn("text",
      when(col("doc_id") === 7, lit("tampered")).otherwise(col("text")))
    val mc = CorpusExport.manifest(corrupted, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(m.map(t => (t._1, t._2)) == mc.map(t => (t._1, t._2))) // counts same
    assert(m != mc) // signature differs
  }
}
