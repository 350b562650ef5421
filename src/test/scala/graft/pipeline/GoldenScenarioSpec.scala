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

  /** Every golden scenario must hold in BOTH stage layouts: the reference's
    * per-entity dirs (default) and the opt-in single-table StageIO layout —
    * same submissions, same numbers, different checkpoint shape.
    */
  private val layouts = Seq(false, true)
  private def readStage(base: String, stage: String, entity: String,
                        single: Boolean): org.apache.spark.sql.DataFrame =
    if (single) StageIO.readEntity(spark, s"$base/work/$stage", entity)
    else spark.read.parquet(s"$base/work/$stage/$entity")

  /** planets.feature:12-38 "Validate and filter planets". */
  test("planets: reference dischema + CSV reproduce the feature's golden outcomes") {
    assume(new java.io.File(s"$testdata/planets").isDirectory)
    for (single <- layouts) {
    val base = freshDir()
    val cfg = Pipeline.SubmissionConfig(
      submissionId = "planets-demo",
      dataFile = s"$testdata/planets/planets_demo.csv",
      dischema = Dischema.parseFile(s"$testdata/planets/planets.dischema.json"),
      workingDir = s"$base/work",
      refdataBaseDir = s"$testdata/planets",
      auditDir = Some(s"$base/audit"),
      singleTableLayout = single)
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
    val planets = readStage(base, "business_rules", "planets", single)
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
    val sats = readStage(base, "business_rules", "largest_satellites", single)
    assert(sats.count() == 9L)
    assert(sats.columns.contains("gm") && sats.columns.contains("radius"))
    assert(readStage(base, "business_rules", "Originalplanets", single).count() == 9L)
    }
  }

  /** planets.feature:40-46 "no extension" + :48-62 "duplicated extension":
    * an extensionless file has no reader — the pipeline fails and the audit
    * records it; a `.csv.csv` file reads fine, and its snake_case header
    * maps POSITIONALLY (field_check is opt-in, so the header row is just
    * skipped) with 0 contract rejections — Yes/No booleans included.
    */
  test("planets: no-extension fails the transform phase; .csv.csv validates cleanly") {
    assume(new java.io.File(s"$testdata/planets").isDirectory)
    for (single <- layouts) {
    val b1 = freshDir()
    val bad = Pipeline.SubmissionConfig(
      submissionId = "planets-noext",
      dataFile = s"$testdata/planets/planets_no_extension",
      dischema = Dischema.parseFile(s"$testdata/planets/planets.dischema.json"),
      workingDir = s"$b1/work", refdataBaseDir = s"$testdata/planets",
      auditDir = Some(s"$b1/audit"), singleTableLayout = single)
    intercept[IllegalArgumentException] { Pipeline.run(spark, bad) }
    assert(new AuditManager(spark, s"$b1/audit").statusOf("planets-noext")
      .contains("failed"))

    val b2 = freshDir()
    Pipeline.run(spark, bad.copy(submissionId = "planets-dupext",
      dataFile = s"$testdata/planets/planets.csv.csv",
      workingDir = s"$b2/work", auditDir = Some(s"$b2/audit")))
    val contract = ErrorSink.readFeedbackErrors(spark, s"$b2/work", "data_contract")
    assert(contract.where("FailureType = 'record'").count() == 0L)
    val row = readStage(b2, "data_contract", "planets", single).collect().head
    assert(row.getAs[String]("planet") == "Mercury")
    assert(row.getAs[Boolean]("hasGlobalMagneticField")) // "Yes" parsed
    assert(!row.getAs[Boolean]("hasRingSystem"))         // "No" parsed
    assert(new AuditManager(spark, s"$b2/audit").statusOf("planets-dupext")
      .contains("finished"))
    }
  }

  /** movies.feature:10-46 "Validate and filter movies" — nested JSON (cast
    * model array), per-(field, category) error_details with reporting-entity
    * override and submission/informational levels, catalog-table refdata,
    * document-level template parameters, median-sequel complex rule.
    */
  test("movies: reference dischema + nested JSON reproduce the feature's golden outcomes") {
    assume(new java.io.File(s"$testdata/movies").isDirectory)
    spark.sql("CREATE DATABASE IF NOT EXISTS movies_refdata")
    spark.sql("DROP TABLE IF EXISTS movies_refdata.sequels")
    // a fresh in-memory catalog + a leftover on-disk warehouse dir from a
    // previous JVM would otherwise collide on the managed location
    val warehouse = new java.io.File("spark-warehouse/movies_refdata.db/sequels")
    if (warehouse.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(warehouse)
    }
    spark.read.parquet(s"$testdata/movies/refdata/movies_sequels.parquet")
      .write.mode("overwrite").saveAsTable("movies_refdata.sequels")
    for (single <- layouts) {
    val base = freshDir()
    val cfg = Pipeline.SubmissionConfig(
      submissionId = "movies-demo",
      dataFile = s"$testdata/movies/movies.json",
      dischema = Dischema.parseFile(s"$testdata/movies/movies.dischema.json"),
      workingDir = s"$base/work",
      refdataBaseDir = s"$testdata/movies",
      auditDir = Some(s"$base/audit"),
      singleTableLayout = single)
    Pipeline.run(spark, cfg)

    // "1 submission rejection and 3 record rejections from data_contract"
    // (BLANKYEAR is informational but still FailureType record, so the
    // feature's record count includes it) + the exact 4-row detail table
    val contract = ErrorSink.readFeedbackErrors(spark, s"$base/work", "data_contract")
    assert(contract.where("FailureType = 'submission'").count() == 1L)
    assert(contract.where("FailureType = 'record'").count() == 3L)
    val details = contract.select("Entity", "ErrorCode", "ErrorMessage", "RecordIndex")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(details == Set(
      ("movies", "BLANKYEAR", "year not provided", 2L),
      ("movies_rename_test", "DODGYYEAR", "year value (NOT_A_NUMBER) is invalid", 1L),
      ("movies", "DODGYDATE", "date_joined value is not valid: daft_date", 1L),
      ("movies", "BLANKTITLE", "title should not be blank", 4L)), details)

    // "The rules restrict movies to 3 qualifying records" — record 1 falls
    // to the DODGYDATE contract rejection, record 4 to LIMITED_RATINGS
    assert(readStage(base, "business_rules", "movies", single).count() == 3L)
    val rules = ErrorSink.readFeedbackErrors(spark, s"$base/work", "business_rules")
    val ruleDetails = rules.select("ErrorCode", "ErrorMessage", "RecordIndex")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(ruleDetails == Set(
      ("LIMITED_RATINGS", "Movie has too few ratings ([6.5])", 4L),
      ("RUBBISH_SEQUEL", "The movie The Greatest Movie Ever has a rubbish sequel", 1L)),
      ruleDetails)

    // statistics: 5 / 1 / 3 / 2 (warnings = BLANKYEAR + RUBBISH_SEQUEL)
    val stats = spark.read.parquet(s"$base/audit/submission_statistics").collect().head
    assert(stats.getAs[Long]("record_count") == 5L)
    assert(stats.getAs[Long]("number_submission_rejections") == 1L)
    assert(stats.getAs[Long]("number_record_rejections") == 3L)
    assert(stats.getAs[Long]("number_warnings") == 2L)
    }
  }

  /** books.feature:52-79 "Validate complex nested XML data (spark)" — two
    * entities from ONE XML file (record_tag + n_records_to_read kwargs),
    * XSD gate, nested book-model array, conformatteddate with date_format,
    * join_header, explode/aggregate/one-to-one-join rule chain.
    */
  test("books: reference dischema + nested XML reproduce the feature's golden outcomes") {
    assume(new java.io.File(s"$testdata/books").isDirectory)
    for (single <- layouts) {
    val base = freshDir()
    val cfg = Pipeline.SubmissionConfig(
      submissionId = "books-demo",
      dataFile = s"$testdata/books/nested_books.XML",
      dischema = Dischema.parseFile(s"$testdata/books/nested_books.dischema.json"),
      workingDir = s"$base/work",
      refdataBaseDir = s"$testdata/books",
      auditDir = Some(s"$base/audit"),
      singleTableLayout = single)
    Pipeline.run(spark, cfg)

    // "there is 1 record rejection from the data_contract phase" —
    // McBookface's mandatory book array is absent (record 3)
    val contract = ErrorSink.readFeedbackErrors(spark, s"$base/work", "data_contract")
      .collect()
    assert(contract.length == 1, contract.mkString("\n"))
    assert(contract.head.getAs[String]("FailureType") == "record")
    assert(contract.head.getAs[String]("Entity") == "nested_books")
    assert(contract.head.getAs[Long]("RecordIndex") == 3L)

    // "The rules restrict nested_books to 3 qualifying records" and the
    // Corets sum: 3 books x 5.95 = 17.85
    val books = readStage(base, "business_rules", "nested_books", single)
    assert(books.count() == 3L)
    val corets = books.where(org.apache.spark.sql.functions.col("name")
        .startsWith("Corets"))
      .select("total_value_of_books").collect().head.getDecimal(0)
    assert(corets.toPlainString == "17.85", corets)
    // join_header landed the bookstore header struct on every author row
    assert(books.columns.contains("bookstore"))

    // statistics: record_count counts the MAIN entity (nested_books' 4
    // authors, not header + authors); rejections = 1 contract + 1 from the
    // code-less author_has_books filter
    val stats = spark.read.parquet(s"$base/audit/submission_statistics").collect().head
    assert(stats.getAs[Long]("record_count") == 4L)
    assert(stats.getAs[Long]("number_record_rejections") == 2L)
    assert(stats.getAs[Long]("number_warnings") == 0L)
    }
  }

  private def runScenario(name: String, dataFile: String, dir: String,
                          single: Boolean = false): String = {
    val base = freshDir()
    Pipeline.run(spark, Pipeline.SubmissionConfig(
      submissionId = name,
      dataFile = s"$dir/$dataFile",
      dischema = Dischema.parseFile(s"$dir/$name.dischema.json"),
      workingDir = s"$base/work",
      refdataBaseDir = dir,
      auditDir = Some(s"$base/audit"),
      singleTableLayout = single))
    base
  }

  /** animals.feature:5-28 + :30-60 — record vs submission vs informational
    * filter routing: a submission failure notifies without removing its
    * record, informational warnings never filter.
    */
  test("animals: both reference XML fixtures reproduce the feature's golden outcomes") {
    assume(new java.io.File(s"$testdata/animals").isDirectory)
    for (single <- layouts) {
    // scenario 1: plain record rejections
    val b1 = runScenario("animals", "animals.xml", s"$testdata/animals", single)
    val r1 = ErrorSink.readFeedbackErrors(spark, s"$b1/work", "business_rules")
    assert(r1.where("ErrorCode = 'ANE01' AND FailureType = 'record'").count() == 2L)
    assert(r1.count() == 2L)
    assert(readStage(b1, "business_rules", "animals", single).count() == 3L)
    val s1 = spark.read.parquet(s"$b1/audit/submission_statistics").collect().head
    assert(s1.getAs[Long]("record_count") == 5L)
    assert(s1.getAs[Long]("number_record_rejections") == 2L)
    assert(s1.getAs[Long]("number_warnings") == 0L)

    // scenario 2: mixture — the Human SUBMISSION failure notifies but its
    // record SURVIVES the filter (7 - 2 ANE01 = 5), the negative-weight
    // warning never removes
    val b2 = runScenario("animals", "animals_mixture.xml", s"$testdata/animals", single)
    val r2 = ErrorSink.readFeedbackErrors(spark, s"$b2/work", "business_rules")
    val byCode = r2.groupBy("ErrorCode", "FailureType", "Status").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(byCode == Map(
      ("ANE01", "record", "error") -> 2L,
      ("ANE02", "submission", "error") -> 1L,
      ("ANE03", "record", "informational") -> 1L), byCode)
    assert(readStage(b2, "business_rules", "animals", single).count() == 5L)
    // per-record message templating fills the offending value
    val msg = r2.where("ErrorCode = 'ANE03'").select("ErrorMessage").head().getString(0)
    assert(msg == "Warning - `-6000.0` is below zero.", msg)
    val s2 = spark.read.parquet(s"$b2/audit/submission_statistics").collect().head
    assert(s2.getAs[Long]("record_count") == 7L)
    assert(s2.getAs[Long]("number_submission_rejections") == 1L)
    assert(s2.getAs[Long]("number_record_rejections") == 2L)
    assert(s2.getAs[Long]("number_warnings") == 1L)
    }
  }

  /** demographics.feature:7-32 — domain types (nhsnumber mod-11, postcode
    * normalization) over the reference's PID fixture: the 12 contract-phase
    * "record rejections" include the row-12 test-number WARNING (the
    * feature's step counts FailureType=record regardless of status); the
    * statistics' 18 exclude it but add the 7 BAD_NHS rule failures.
    */
  test("demographics: reference dischema + PID CSV reproduce the feature's golden outcomes") {
    assume(new java.io.File(s"$testdata/demographics").isDirectory)
    for (single <- layouts) {
    val base = runScenario("basic_demographics", "basic_demographics.csv",
      s"$testdata/demographics", single)
    val contract = ErrorSink.readFeedbackErrors(spark, s"$base/work", "data_contract")
    assert(contract.where("FailureType = 'record'").count() == 12L)
    assert(contract.where("FailureType = 'record' AND Status != 'informational'")
      .count() == 11L) // 6 bad checksums + 5 bad postcodes
    // the one warning: 9023104455 is checksum-valid but starts with '9'
    val warn = contract.where("Status = 'informational'").collect()
    assert(warn.length == 1 && warn.head.getAs[Long]("RecordIndex") == 12L)

    val demo = readStage(base, "business_rules", "demographics", single)
    assert(demo.count() == 2L)
    assert(demo.where("NHS_Number_Valid = 'FALSE'").count() == 0L)
    val rules = ErrorSink.readFeedbackErrors(spark, s"$base/work", "business_rules")
    assert(rules.where("ErrorCode = 'BAD_NHS'").count() == 7L)

    val stats = spark.read.parquet(s"$base/audit/submission_statistics").collect().head
    assert(stats.getAs[Long]("record_count") == 13L)
    assert(stats.getAs[Long]("number_record_rejections") == 18L)
    assert(stats.getAs[Long]("number_warnings") == 1L)
    }
  }
}
