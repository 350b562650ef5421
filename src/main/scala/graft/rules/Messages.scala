package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.config.Reporting

/** Feedback-message construction as DataFrame column logic.
  *
  * The reference materialises one `FeedbackMessage` Python object per failing
  * row on the driver (ref: spark/rules.py:400-421 `toLocalIterator`) — a
  * scale-killer at 100 TB. Here a notification is a *projection*: the failing
  * rows are selected and the message columns (including the per-record
  * templated text) are computed by executors, so messages stay distributed
  * end-to-end and are written straight to the sink.
  *
  * Column set mirrors `FeedbackMessage.HEADER`
  * (ref: core_engine/message.py:184-197).
  */
object Messages {
  val RecordIndexColumn = "__record_index__"

  val header: Seq[String] = Seq(
    "Entity", "Key", "FailureType", "Status", "ErrorType", "ErrorLocation",
    "ErrorMessage", "ErrorCode", "ReportingField", "RecordIndex", "Value", "Category")

  val schema: StructType = StructType(Seq(
    StructField("Entity", StringType),
    StructField("Key", StringType),
    StructField("FailureType", StringType),
    StructField("Status", StringType),
    StructField("ErrorType", StringType),
    StructField("ErrorLocation", StringType),
    StructField("ErrorMessage", StringType),
    StructField("ErrorCode", StringType),
    StructField("ReportingField", StringType),
    StructField("RecordIndex", LongType),
    StructField("Value", StringType),
    StructField("Category", StringType)))

  /** Render a `{{field}}` message template into a Column over the record's
    * fields (ref per-row templating: spark/rules.py:409-411). Unknown fields
    * render as the literal placeholder text.
    */
  def renderTemplate(template: String, availableColumns: Seq[String]): Column = {
    val available = availableColumns.toSet
    val pattern = "\\{\\{\\s*([A-Za-z0-9_.]+)\\s*\\}\\}".r
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- pattern.findAllMatchIn(template)) {
      if (m.start > last) parts += lit(template.substring(last, m.start))
      val field = m.group(1)
      if (available.contains(field)) parts += coalesce(col(field).cast(StringType), lit(""))
      else parts += lit(m.matched)
      last = m.end
    }
    if (last < template.length) parts += lit(template.substring(last))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** The record's key-field values as the user-facing Key string
    * (ref: common/error_utils.py:30-65 — key values joined by " -- ").
    */
  def keyColumn(availableColumns: Seq[String], keyFields: Seq[String]): Column = {
    val present = keyFields.filter(availableColumns.contains)
    if (present.isEmpty) lit(null).cast(StringType)
    else concat_ws(" -- ", present.map(k => col(s"`$k`").cast(StringType)): _*)
  }

  /** Project failing rows of `entity` into message rows. */
  def notifyDF(entity: DataFrame, entityName: String, expression: String,
               reporting: Reporting, excludedColumns: Seq[String] = Nil,
               keyFields: Seq[String] = Nil): DataFrame = {
    val matched0 = entity.where(expr(expression))
    val matched = if (excludedColumns.nonEmpty) matched0.drop(excludedColumns: _*) else matched0
    val cols = matched.columns.toSeq
    val recordIndex: Column =
      if (cols.contains(RecordIndexColumn)) col(RecordIndexColumn).cast(LongType)
      else lit(null).cast(LongType)
    matched.select(
      lit(reporting.reportingEntityOverride.getOrElse(entityName)).as("Entity"),
      keyColumn(cols, keyFields).as("Key"),
      lit(reporting.failureType).as("FailureType"),
      lit(if (reporting.isInformational) "informational" else "error").as("Status"),
      lit(reporting.failureType).as("ErrorType"),
      lit(reporting.errorLocation.orNull).cast(StringType).as("ErrorLocation"),
      renderTemplate(reporting.message, cols).as("ErrorMessage"),
      lit(reporting.code).as("ErrorCode"),
      lit(reporting.reportingField.orNull).cast(StringType).as("ReportingField"),
      recordIndex.as("RecordIndex"),
      lit(null).cast(StringType).as("Value"),
      lit(reporting.category.orNull).cast(StringType).as("Category"))
  }

  /** An empty message frame with the canonical schema. */
  def empty(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Error-report aggregate (ref: reporting/error_report.py:28-36,115-140):
    * messages grouped by type/entity/location/category/code with counts.
    */
  def aggregateReport(messages: DataFrame): DataFrame =
    messages
      .groupBy(col("ErrorType").as("Type"), col("Entity").as("Table"),
        col("ErrorLocation").as("Data_Item"), col("Category"), col("ErrorCode").as("Error_Code"))
      .agg(count(lit(1)).as("Count"))
}
