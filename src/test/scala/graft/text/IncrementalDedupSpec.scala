package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private def ref = Seq(
    (10L, "already ingested document one"),
    (11L, "already ingested document two"),
    (12L, "already ingested document three")
  ).toDF("doc_id", "text")

  private def batch = Seq(
    (1L, "a genuinely new document"),
    (2L, "already ingested document two"), // true duplicate
    (3L, "another new document entirely"),
    (4L, "already ingested document one") // true duplicate
  ).toDF("doc_id", "text")

  test("newAgainstReference equals the exact anti-join") {
    val out = IncrementalDedup.newAgainstReference(batch, ref, "text",
      expectedItems = 16, numBits = 1 << 10)
    val naive = batch.join(ref.select("text").distinct(), Seq("text"), "left_anti")
    assert(rows(out) == rows(naive.select("doc_id", "text")))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("bloom has no false negatives: every reference key tests positive") {
    val bloom = IncrementalDedup.bloomBytes(ref, col("text"), 16, 1 << 10)
    val hits = ref.where(IncrementalDedup.mightContain(bloom, col("text"))).count()
    assert(hits == 3)
  }

  test("false-positive rate is bounded at the sized capacity") {
    // 1000 reference keys in a 10-bits-per-item sketch: FPP ~1%; assert the
    // measured rate over 1000 disjoint probe keys stays well under 5%.
    val bigRef = spark.range(1000).select(concat(lit("ref"), col("id")).as("text"))
    val bloom = IncrementalDedup.bloomBytes(bigRef, col("text"), 1000, 10000)
    val probes = spark.range(1000).select(concat(lit("probe"), col("id")).as("text"))
    val fp = probes.where(IncrementalDedup.mightContain(bloom, col("text"))).count()
    assert(fp <= 50, s"false-positive count $fp out of 1000 exceeds bound")
  }

  test("empty reference passes the whole batch through") {
    val out = IncrementalDedup.newAgainstReference(batch, ref.where(lit(false)),
      "text", expectedItems = 16, numBits = 1 << 10)
    assert(rows(out) == rows(batch))
  }
}
