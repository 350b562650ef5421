package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.Dischema
import graft.pipeline.Pipeline
import graft.readers.Readers

/** Full four-service pipeline over a working directory: submitted CSV ->
  * transform checkpoint -> data contract -> business rules (refdata via the
  * lazy loader, contract rejections anti-joined) -> error report, with audit
  * status transitions — then read the business_rules checkpoint back.
  * Same golden semantics as q_dischema_e2e but exercising the service path
  * (parquet stage boundaries, JSONL sinks, audit tables).
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_e2e" -> ((s, dir) => {
      val workingDir = "/tmp/graft_q_pipeline_e2e/work"
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path("/tmp/graft_q_pipeline_e2e"), true)

      // submitted file: customers as headered CSV in key order
      val dataFile = "/tmp/graft_q_pipeline_e2e/customer.csv"
      s.read.parquet(s"$dir/customer.parquet")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .sort("c_custkey").coalesce(1)
        .write.option("header", value = true).csv(dataFile)

      val cfg = Pipeline.SubmissionConfig(
        submissionId = "sub-001",
        dataFile = dataFile,
        dischema = Dischema.parseString(DischemaQueries.dischemaJson,
          _ => DischemaQueries.ruleStoreJson),
        workingDir = workingDir,
        refdataBaseDir = dir,
        auditDir = Some("/tmp/graft_q_pipeline_e2e/audit"),
        csvOptions = Readers.CsvOptions())

      Pipeline.run(s, cfg)
      s.read.parquet(s"$workingDir/business_rules/customer")
        .select("c_custkey", "c_name", "nation_name", "bal_band")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // identical golden result to q_dischema_e2e — the pipeline path must not
    // change the semantics, only the physical staging
    "q_pipeline_e2e" -> DischemaQueries.oracleSql("q_dischema_e2e")
  )
}
