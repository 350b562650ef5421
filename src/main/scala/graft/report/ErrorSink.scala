package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rules.Messages

/** Message sinks and report tables.
  *
  * The reference writes one JSONL file per stage from a background writer
  * thread (ref: common/error_utils.py:30-65, 118-173). Spark-natively the
  * sink is a distributed JSON write to the same per-stage location — a
  * directory of JSONL part files (single-file append does not scale past one
  * driver; every part line is the same record shape). Processing errors get
  * their own location (ref: error_utils.py:68-96).
  */
object ErrorSink {

  def feedbackErrorsPath(workingDir: String, stage: String): String =
    s"$workingDir/errors/${stage}_errors.jsonl"

  def processingErrorsPath(workingDir: String): String =
    s"$workingDir/processing_errors/processing_errors.jsonl"

  /** Write a stage's feedback messages as JSONL (append, like the
    * reference's "a" mode).
    */
  def writeFeedbackErrors(messages: DataFrame, workingDir: String, stage: String): String = {
    val path = feedbackErrorsPath(workingDir, stage)
    messages.write.mode("append").json(path)
    path
  }

  /** Read a stage's feedback messages back with the canonical schema. */
  def readFeedbackErrors(spark: SparkSession, workingDir: String, stage: String): DataFrame =
    spark.read.schema(Messages.schema).json(feedbackErrorsPath(workingDir, stage))

  /** Read every stage's messages under the working dir. */
  def readAllFeedbackErrors(spark: SparkSession, workingDir: String): DataFrame =
    spark.read.schema(Messages.schema).json(s"$workingDir/errors/*_errors.jsonl")

  /** Engine-internal (processing) errors, reference layout
    * (ref: error_utils.py:68-96).
    */
  def writeProcessingError(spark: SparkSession, workingDir: String, stage: String,
                           message: String, traceback: Seq[String] = Nil): Unit = {
    import spark.implicits._
    Seq((stage, "processing", "integrity", message, traceback))
      .toDF("step_name", "error_location", "error_level", "error_message", "error_traceback")
      .write.mode("append").json(processingErrorsPath(workingDir))
  }

  /** Detail report rows in the UserMessage column order
    * (ref: core_engine/message.py:95-132): every message, Key populated,
    * sorted for stable presentation by entity then record index.
    */
  def detailReport(messages: DataFrame): DataFrame =
    messages.select(
      col("Entity"), col("Key"), col("FailureType"), col("Status"),
      col("ErrorType"), col("ErrorLocation"), col("ErrorMessage"), col("ErrorCode"),
      col("ReportingField"), col("Value"), col("Category"), col("RecordIndex"))
      .orderBy(col("Entity"), col("RecordIndex"))

  /** Aggregate report (ref: reporting/error_report.py:115-140), re-exported
    * here so report consumers need only this module.
    */
  def aggregateReport(messages: DataFrame): DataFrame = Messages.aggregateReport(messages)

  /** Marker written into CSV cells for SQL NULL so empty string and null
    * survive a round-trip distinguishably (CSV has no native null).
    */
  val CsvNullMarker = "\\N"

  /** Detail report as CSV — the offline stand-in for the reference's Excel
    * detail sheets: the exact `FeedbackMessage.HEADER` column order
    * (ref: core_engine/message.py:184-197), rows globally ordered by
    * (Entity, RecordIndex), and files split at `overflow` rows, mirroring
    * the reference's 1M-row sheet overflow (ref: excel_report.py:194).
    * The split is Spark-native (`maxRecordsPerFile`), so the write stays
    * fully distributed — no driver-side row loop at any volume; the global
    * sort range-partitions, and part-file lexicographic order preserves it.
    */
  def writeDetailCsv(messages: DataFrame, path: String,
                     overflow: Long = 1000000L): String = {
    messages
      .select(Messages.header.map(col): _*)
      .orderBy(col("Entity"), col("RecordIndex"))
      .write.mode("overwrite")
      .option("header", true)
      .option("nullValue", CsvNullMarker)
      .option("maxRecordsPerFile", overflow)
      .csv(path)
    path
  }

  /** Read a detail CSV directory back with the canonical message schema. */
  def readDetailCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Messages.schema)
      .option("header", true)
      .option("nullValue", CsvNullMarker)
      .csv(path)

  /** The full error-report workbook as CSV — one directory per sheet of the
    * reference's Excel report (ref: excel_report.py:24-345): `summary`
    * (status + lane counts), `summary_table` (Type x Table counts),
    * `aggregate` (per-code counts), `detail` (every message, overflow-split).
    * Small sheets coalesce to one file; the detail sheet stays distributed.
    */
  def writeReportBundle(messages: DataFrame, dir: String,
                        overflow: Long = 1000000L,
                        processingFailed: Boolean = false): String = {
    def oneCsv(df: DataFrame, sub: String): Unit =
      df.coalesce(1).write.mode("overwrite")
        .option("header", true).option("nullValue", CsvNullMarker)
        .csv(s"$dir/$sub")
    oneCsv(summaryReport(messages, processingFailed), "summary")
    oneCsv(summaryTable(messages), "summary_table")
    oneCsv(aggregateReport(messages), "aggregate")
    writeDetailCsv(messages, s"$dir/detail", overflow)
    dir
  }

  // ------------------------------------------------------- summary report

  /** Error-report category lane (ref: reporting/constants.py:8-22). */
  private def reportType: org.apache.spark.sql.Column =
    when(col("FailureType") === "submission" && col("Status") =!= "informational",
      "File Rejection")
      .when(col("Status") =!= "informational", "Record Rejection")
      .otherwise("Warning")

  /** The summary sheet's Type x Table counts
    * (ref: reporting/excel_report.py:70-77).
    */
  def summaryTable(messages: DataFrame): DataFrame =
    messages.groupBy(reportType.as("Type"), col("Entity").as("Table"))
      .agg(count(lit(1)).as("Count"))

  /** Per-submission summary block (ref: excel_report.py:24-107): one row of
    * lane counts plus the overall report status, derived with the
    * reference's precedence — processing failure, then file rejection, then
    * record rejection, then accepted-with-warnings, then accepted. A single
    * global aggregation: one reduce whatever the message volume.
    */
  def summaryReport(messages: DataFrame, processingFailed: Boolean = false): DataFrame = {
    val t = reportType
    val counts = messages.agg(
      coalesce(sum(when(t === "File Rejection", 1L)), lit(0L)).as("n_file_rejections"),
      coalesce(sum(when(t === "Record Rejection", 1L)), lit(0L)).as("n_record_rejections"),
      coalesce(sum(when(t === "Warning", 1L)), lit(0L)).as("n_warnings"),
      count(lit(1)).as("n_messages"))
    val status =
      if (processingFailed)
        lit("There was an issue processing the submission. Please contact support.")
      else
        when(col("n_file_rejections") > 0, "File has been rejected")
          .when(col("n_record_rejections") > 0, "File has been accepted with record rejections")
          .when(col("n_warnings") > 0,
            "File has been accepted, all records accepted with warnings")
          .otherwise("File has been accepted, no issues to report")
    counts.withColumn("report_status", status)
  }
}
