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
}
