package graft.pipeline

import graft.SparkSpec
import graft.audit.AuditManager
import graft.config.Dischema
import graft.report.ErrorSink

/** DIFFERENTIAL parity against the reference's OWN test corpus: the BDD
  * datasets under tests/testdata are configs the reference authored, with
  * golden outcomes pinned in the tests/features feature files — the one
  * oracle the
  * DuckDB gate cannot see (message categories, rejection counts, statistics
  * on documents this repo did NOT write). Each test drives the actual
  * reference dischema + data file through the full 4-service pipeline and
  * asserts the feature file's numbers.
  */
class GoldenScenarioSpec extends SparkSpec {

  private val testdata = "/root/reference/tests/testdata"

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_golden_").toString

  /** planets.feature:12-38 "Validate and filter planets". */
  test("planets: reference dischema + CSV reproduce the feature's golden outcomes") {
    assume(new java.io.File(s"$testdata/planets").isDirectory)
    val base = freshDir()
    val cfg = Pipeline.SubmissionConfig(
      submissionId = "planets-demo",
      dataFile = s"$testdata/planets/planets_demo.csv",
      dischema = Dischema.parseFile(s"$testdata/planets/planets.dischema.json"),
      workingDir = s"$base/work",
      refdataBaseDir = s"$testdata/planets",
      auditDir = Some(s"$base/audit"))
    val result = Pipeline.run(spark, cfg)

    // "there is 1 record rejection from the data_contract phase" — Pluto's
    // blank mandatory mass; "no submission rejections"
    val contract = ErrorSink.readFeedbackErrors(spark, s"$base/work", "data_contract")
      .collect()
    assert(contract.length == 1, contract.mkString("\n"))
    assert(contract.head.getAs[String]("FailureType") == "record")
    assert(contract.head.getAs[String]("ReportingField") == "mass")
    assert(contract.head.getAs[Long]("RecordIndex") == 9L) // Pluto, row 9

    // "The rules restrict planets to 1 qualifying record";
    // "does not contain Jupiter"; "contains Neptune"
    val planets = spark.read.parquet(s"$base/work/business_rules/planets")
    val names = planets.select("planet").collect().map(_.getString(0)).toSeq
    assert(names == Seq("Neptune"), names)
    assert(result.recordCounts == Map("planets" -> 1L))

    // "At least one row has generated error code HIGH_DENSITY / WEAK_ESCAPE"
    // — pinned to the EXACT per-code counts over the satellite-exploded
    // entity (Jupiter and Mars fan out x2 through the refdata join):
    //   WEAK_ESCAPE    Jupiter x2, Saturn                          =  3
    //   LONG_ORBIT     Mercury, Venus, Earth, Mars x2              =  5
    //   HIGH_DENSITY   Saturn (NOT DENSITY_OVER_1000: the outer
    //                  error_code on a rule_name filter is dropped)  =  1
    //   STRONG_GRAVITY Mercury, Venus, Earth, Mars x2, Saturn,
    //                  Uranus, Pluto                                =  8
    val rules = ErrorSink.readFeedbackErrors(spark, s"$base/work", "business_rules")
    val byCode = rules.groupBy("ErrorCode").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCode == Map("WEAK_ESCAPE" -> 3L, "LONG_ORBIT" -> 5L,
      "HIGH_DENSITY" -> 1L, "STRONG_GRAVITY" -> 8L), byCode)

    // statistics table: record_count 9 / record rejections 18 / warnings 0
    val stats = spark.read.parquet(s"$base/audit/submission_statistics").collect().head
    assert(stats.getAs[Long]("record_count") == 9L)
    assert(stats.getAs[Long]("number_record_rejections") == 18L)
    assert(stats.getAs[Long]("number_submission_rejections") == 0L)
    assert(stats.getAs[Long]("number_warnings") == 0L)
    assert(new AuditManager(spark, s"$base/audit").statusOf("planets-demo")
      .contains("finished"))

    // the derived largest_satellites entity and the Original copy land as
    // business_rules parquet like every other catalog entity
    val sats = spark.read.parquet(s"$base/work/business_rules/largest_satellites")
    assert(sats.count() == 9L)
    assert(sats.columns.contains("gm") && sats.columns.contains("radius"))
    assert(spark.read.parquet(s"$base/work/business_rules/Originalplanets").count() == 9L)
  }
}
