package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.{Reporting, Step}
import graft.report.ErrorSink
import graft.rules.{EntityCatalog, StepInterpreter}

/** Correctness queries for the error sink chain: notify with key fields ->
  * JSONL write -> read back -> detail report.
  */
object ReportQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_errors_jsonl" -> ((s, dir) => {
      val workingDir = "/tmp/graft_q_errors_jsonl"
      // clean (the sink appends, as the reference does)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(workingDir), true)

      val cat = new EntityCatalog(
        Map("orders" -> s.read.parquet(s"$dir/orders.parquet")),
        keyFields = Map("orders" -> Seq("o_orderkey")))
      val msgs = StepInterpreter.evaluate(cat,
        Step.Notify("orders", "o_totalprice > 400000",
          Reporting("BIG_ORDER", "too big", category = Some("Bad value"),
            errorLocation = Some("o_totalprice")))).get
      ErrorSink.writeFeedbackErrors(msgs, workingDir, "business_rules")
      val back = ErrorSink.readFeedbackErrors(s, workingDir, "business_rules")
      ErrorSink.detailReport(back)
        .select("Key", "ErrorCode", "ErrorMessage", "Category", "Entity")
    }),

    // CSV detail report (the reference's Excel detail sheet, offline): the
    // exact FeedbackMessage.HEADER column order, null-marker round-trip,
    // 1k-row file overflow exercised (the reference splits sheets at 1M).
    // The oracle replicates every one of the 12 columns.
    "q_error_detail_csv" -> ((s, dir) => {
      val workingDir = "/tmp/graft_q_error_detail_csv"
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(workingDir), true)

      val cat = new EntityCatalog(
        Map("orders" -> s.read.parquet(s"$dir/orders.parquet")),
        keyFields = Map("orders" -> Seq("o_orderkey")))
      val msgs = StepInterpreter.evaluate(cat,
        Step.Notify("orders", "o_totalprice > 400000",
          Reporting("BIG_ORDER", "too big", category = Some("Bad value"),
            errorLocation = Some("o_totalprice")))).get
      val path = ErrorSink.writeDetailCsv(msgs, s"$workingDir/detail", overflow = 1000L)
      // the overflow split must actually engage (>1 data file at sf >= 0.01)
      val nFiles = fs.globStatus(new org.apache.hadoop.fs.Path(s"$path/*.csv")).length
      require(nFiles > 1 || msgs.limit(1001).count() <= 1000,
        s"overflow split produced $nFiles files")
      ErrorSink.readDetailCsv(s, path)
    }),

    // Error-code map populate (ref error_report.py:39-51,106-112): a flat
    // {field -> code} JSON expands across the three contract categories
    // and fills ONLY null codes; a message's own code wins; unmapped
    // fields stay null; non-textual map values are skipped.
    "q_error_codes_map" -> ((s, dir) => {
      val mapPath = "/tmp/graft_q_error_codes.json"
      java.nio.file.Files.writeString(java.nio.file.Path.of(mapPath),
        """{"c_name": "001", "legacy_nested": {"x": "9"}}""")
      val msgs = s.read.parquet(s"$dir/customer.parquet").select(
        when(col("c_custkey") % 2 === 0, "c_name").otherwise("c_acctbal")
          .as("ReportingField"),
        when(col("c_custkey") % 3 === 0, "Blank")
          .when(col("c_custkey") % 3 === 1, "Bad value")
          .otherwise("Wrong format").as("Category"),
        when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
          .otherwise(lit("OWN")).as("ErrorCode"))
      val codes = ErrorSink.errorCodesFromJson(s, mapPath)
      ErrorSink.populateErrorCodes(msgs, codes)
        .groupBy("ReportingField", "Category", "ErrorCode")
        .agg(count(lit(1)).as("n"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_errors_jsonl" ->
      ("SELECT CAST(o_orderkey AS VARCHAR) AS Key, 'BIG_ORDER' AS ErrorCode, " +
        "'too big' AS ErrorMessage, 'Bad value' AS Category, 'orders' AS Entity " +
        "FROM orders WHERE o_totalprice > 400000"),
    "q_error_detail_csv" ->
      ("SELECT 'orders' AS Entity, CAST(o_orderkey AS VARCHAR) AS Key, " +
        "'record' AS FailureType, 'error' AS Status, 'record' AS ErrorType, " +
        "'o_totalprice' AS ErrorLocation, 'too big' AS ErrorMessage, " +
        "'BIG_ORDER' AS ErrorCode, CAST(NULL AS VARCHAR) AS ReportingField, " +
        "CAST(NULL AS BIGINT) AS RecordIndex, CAST(NULL AS VARCHAR) AS Value, " +
        "'Bad value' AS Category FROM orders WHERE o_totalprice > 400000"),
    "q_error_codes_map" ->
      ("SELECT ReportingField, Category, ErrorCode, count(1)::BIGINT AS n FROM (" +
        "SELECT CASE WHEN c_custkey % 2 = 0 THEN 'c_name' ELSE 'c_acctbal' END AS ReportingField, " +
        "CASE WHEN c_custkey % 3 = 0 THEN 'Blank' WHEN c_custkey % 3 = 1 THEN 'Bad value' " +
        "ELSE 'Wrong format' END AS Category, " +
        "CASE WHEN c_custkey % 5 <> 0 THEN 'OWN' " +
        "WHEN c_custkey % 2 = 0 THEN '001' ELSE NULL END AS ErrorCode " +
        "FROM customer) t GROUP BY 1, 2, 3")
  )
}
