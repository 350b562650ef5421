package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_errors_jsonl" ->
      ("SELECT CAST(o_orderkey AS VARCHAR) AS Key, 'BIG_ORDER' AS ErrorCode, " +
        "'too big' AS ErrorMessage, 'Bad value' AS Category, 'orders' AS Entity " +
        "FROM orders WHERE o_totalprice > 400000")
  )
}
