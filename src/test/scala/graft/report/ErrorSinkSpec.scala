package graft.report

import graft.SparkSpec
import graft.config.{DeferredFilter, Reporting, Step}
import graft.rules.{EntityCatalog, StepInterpreter, SyncFilters}

class ErrorSinkSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sink_").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("notify populates Key from the entity's key fields") {
    val cat = new EntityCatalog(Map("planets" -> planets),
      keyFields = Map("planets" -> Seq("name", "n_moons")))
    val msgs = StepInterpreter.evaluate(cat,
      Step.Notify("planets", "gravity > 2", Reporting("G", "big"))).get
    assert(msgs.select("Key").collect().map(_.getString(0)).toSeq == Seq("Jupiter -- 95"))
  }

  test("sync filters carry key fields into messages") {
    val cat = new EntityCatalog(Map("planets" -> planets),
      keyFields = Map("planets" -> Seq("name")))
    val msgs = SyncFilters(cat, Seq(
      DeferredFilter("planets", "n_moons < 100", Reporting("MOONS", "too many"))))
    assert(msgs.head.select("Key").collect().map(_.getString(0)).toSet == Set("Saturn"))
  }

  test("JSONL round-trip preserves messages per stage; detail report orders columns") {
    val wd = tmpDir()
    val cat = new EntityCatalog(Map("planets" -> planets),
      keyFields = Map("planets" -> Seq("name")))
    val msgs = StepInterpreter.evaluate(cat,
      Step.Notify("planets", "gravity < 0.5", Reporting("LOW_G", "weak gravity"))).get
    ErrorSink.writeFeedbackErrors(msgs, wd, "business_rules")
    val back = ErrorSink.readFeedbackErrors(spark, wd, "business_rules")
    assert(back.count() == 2) // Mercury, Mars
    assert(ErrorSink.detailReport(back).columns.toSeq == Seq(
      "Entity", "Key", "FailureType", "Status", "ErrorType", "ErrorLocation",
      "ErrorMessage", "ErrorCode", "ReportingField", "Value", "Category", "RecordIndex"))
    // append semantics: second write doubles the count
    ErrorSink.writeFeedbackErrors(msgs, wd, "business_rules")
    assert(ErrorSink.readFeedbackErrors(spark, wd, "business_rules").count() == 4)
  }

  test("readAllFeedbackErrors unions stages; processing errors have their own location") {
    val wd = tmpDir()
    val cat = new EntityCatalog(Map("planets" -> planets), keyFields = Map.empty)
    val msgs = StepInterpreter.evaluate(cat,
      Step.Notify("planets", "n_moons = 0", Reporting("NO_MOONS", "no moons"))).get
    ErrorSink.writeFeedbackErrors(msgs, wd, "data_contract")
    ErrorSink.writeFeedbackErrors(msgs, wd, "business_rules")
    assert(ErrorSink.readAllFeedbackErrors(spark, wd).count() == 4)
    ErrorSink.writeProcessingError(spark, wd, "business_rules", "boom", Seq("trace1"))
    val pe = spark.read.json(ErrorSink.processingErrorsPath(wd))
    assert(pe.count() == 1)
    assert(pe.select("error_message").collect().head.getString(0) == "boom")
  }
}
