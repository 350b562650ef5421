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
    }),

    // The production entry point: submissions discovered as
    // <name>.csv + <name>.metadata.json pairs under a landing prefix,
    // deadlettering mispairs, then the same four services. The golden
    // result must equal q_pipeline_e2e — discovery only finds the work.
    "q_pipeline_discovery" -> ((s, dir) => {
      val base = "/tmp/graft_q_pipeline_discovery"
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val landing = s"$base/landing"
      java.nio.file.Files.createDirectories(java.nio.file.Path.of(landing))

      // the submitted pair (CSV written by Spark as a directory, so land a
      // single concatenated file instead)
      val csvDir = s"$base/stage_csv"
      s.read.parquet(s"$dir/customer.parquet")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .sort("c_custkey").coalesce(1)
        .write.option("header", value = true).csv(csvDir)
      val part = new java.io.File(csvDir).listFiles().filter(_.getName.endsWith(".csv")).head
      java.nio.file.Files.move(part.toPath, java.nio.file.Path.of(s"$landing/customers.csv"))
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$landing/customers.metadata.json"),
        """{"dataset_id": "customers", "submitting_org": "X26"}""")
      // a mispaired stem (two data files + metadata) that must deadletter
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$landing/bad.csv"), "a\n1\n")
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$landing/bad.xml"), "<a/>")
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$landing/bad.metadata.json"),
        """{"dataset_id": "customers"}""")

      val (disc, results) = graft.pipeline.Discovery.run(
        s, landing, s"$base/processed",
        dischemaFor = d =>
          if (d == "customers")
            Some(Dischema.parseString(DischemaQueries.dischemaJson,
              _ => DischemaQueries.ruleStoreJson))
          else None,
        refdataBaseDir = dir)
      require(disc.deadlettered.size == 3, s"expected 3 deadlettered, got $disc")
      require(results.size == 1 && results.head._2.isRight, s"pipeline failed: $results")
      val id = results.head._1
      s.read.parquet(s"$base/processed/$id/business_rules/customer")
        .select("c_custkey", "c_name", "nation_name", "bal_band")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // identical golden result to q_dischema_e2e — the pipeline path must not
    // change the semantics, only the physical staging
    "q_pipeline_e2e" -> DischemaQueries.oracleSql("q_dischema_e2e"),
    // discovery feeds the identical pipeline: same golden result
    "q_pipeline_discovery" -> DischemaQueries.oracleSql("q_dischema_e2e")
  )
}
