package graft.pipeline

import graft.SparkSpec
import graft.config.Dischema
import graft.readers.Readers
import graft.report.ErrorSink
import org.apache.spark.sql.functions._

/** Correctness guard for the parallel per-entity stage loops: a
  * many-small-entities dischema where EVERY entity produces contract
  * messages, so the serialized JSONL append runs under real contention
  * from 8 concurrent entity workers — lost or torn appends would show up
  * as wrong per-entity error counts.
  */
class ManyEntitiesSpec extends SparkSpec {

  private val nEntities = 30
  private val nRows = 40

  private def dischemaJson: String = {
    val datasets = (1 to nEntities).map { i =>
      // field `b` is declared int but the data is alphabetic -> every row
      // of every entity raises a cast error through the shared append
      s""""ent_$i": {"fields": {"k": "int", "a": "str", "b": "int"},
         | "key_field": "k", "mandatory_fields": ["k"]}""".stripMargin
    }.mkString(",")
    s"""{"contract": {"datasets": {$datasets}},
       | "transformations": {"filters": [
       |   {"entity": "ent_1", "name": "half", "expression": "k <= ${nRows / 2}",
       |    "error_code": "HALF", "failure_message": "top half", "reporting_field": "k"}
       | ]}}""".stripMargin
  }

  test("30 entities x 8 workers: no lost/torn appends, per-entity outputs intact") {
    val base = java.nio.file.Files.createTempDirectory("graft_many_").toString
    val dataFile = s"$base/tiny.csv"
    java.nio.file.Files.writeString(java.nio.file.Path.of(dataFile),
      "k,a,b\n" + (1 to nRows).map(i => s"$i,alpha_$i,beta_$i").mkString("\n") + "\n")
    val cfg = Pipeline.SubmissionConfig(
      submissionId = "many-tiny",
      dataFile = dataFile,
      dischema = Dischema.parseString(dischemaJson, _ => "{}"),
      workingDir = s"$base/work",
      auditDir = Some(s"$base/audit"),
      csvOptions = Readers.CsvOptions(),
      entityParallelism = 8)
    val result = Pipeline.run(spark, cfg)

    // every declared entity came through with every row (b cast errors are
    // record-level messages; k itself is clean so no rejection lane fires
    // on the key, and bad-value records are rejected per entity)
    assert(result.recordCounts.keySet == (1 to nEntities).map(i => s"ent_$i").toSet)

    // the shared data_contract JSONL holds EXACTLY nRows messages per
    // entity — the append-under-contention invariant
    val perEntity = ErrorSink.readFeedbackErrors(spark, s"$base/work", "data_contract")
      .groupBy("Entity").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perEntity.size == nEntities, s"entities with errors: ${perEntity.size}")
    assert(perEntity.values.forall(_ == nRows.toLong),
      s"per-entity error counts: ${perEntity.toSeq.sortBy(_._1).take(5)}...")

    // per-entity stage dirs all exist with the right shape
    (1 to nEntities).foreach { i =>
      val typed = spark.read.parquet(s"$base/work/data_contract/ent_$i")
      assert(typed.count() == nRows.toLong)
      assert(typed.schema("b").dataType.simpleString == "bigint")
      assert(typed.where(col("b").isNotNull).count() == 0L) // every cast failed
      assert(spark.read.parquet(s"$base/work/business_rules/Originalent_$i").count() == nRows.toLong)
    }

    // the one rule filter fired only for its entity
    val rules = ErrorSink.readFeedbackErrors(spark, s"$base/work", "business_rules")
      .groupBy("Entity").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rules == Map("ent_1" -> (nRows / 2).toLong), rules)
  }
}
