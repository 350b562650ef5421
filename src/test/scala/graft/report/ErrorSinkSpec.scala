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

  test("detail CSV: exact reference header order, null round-trip, overflow split") {
    import org.apache.spark.sql.Row
    import spark.implicits._
    val wd = tmpDir()
    // 25 rows with nulls AND empty strings in Value — both must survive
    val msgs = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 25).map { i =>
        Row("planets", s"key$i", "record", "error", "record", "loc", "msg", "CODE",
          null, if (i % 3 == 0) null else i.toLong,
          if (i % 2 == 0) "" else null, "Bad value")
      }), graft.rules.Messages.schema)
    val path = ErrorSink.writeDetailCsv(msgs, s"$wd/detail", overflow = 10L)
    // header line matches FeedbackMessage.HEADER exactly (ref message.py:184-197)
    val firstCsv = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".csv")).sortBy(_.getName)
    assert(firstCsv.length >= 3) // 25 rows at 10-row overflow
    val header = scala.io.Source.fromFile(firstCsv.head).getLines().next()
    assert(header == "Entity,Key,FailureType,Status,ErrorType,ErrorLocation," +
      "ErrorMessage,ErrorCode,ReportingField,RecordIndex,Value,Category")
    val back = ErrorSink.readDetailCsv(spark, path)
    assert(back.count() == 25)
    // null vs empty string distinguishable after the round-trip
    assert(back.where("Value = ''").count() == 12)
    assert(back.where("Value IS NULL").count() == 13)
    assert(back.where("RecordIndex IS NULL").count() == 8)
    // file split preserves the global (Entity, RecordIndex) order: reading
    // the part files in name order yields monotonically increasing indices
    val backIdx = firstCsv.flatMap(f =>
      ErrorSink.readDetailCsv(spark, f.getAbsolutePath)
        .select("RecordIndex").as[Option[Long]].collect().flatten)
    assert(backIdx.toSeq == backIdx.sorted.toSeq)
  }

  test("report bundle writes every workbook sheet as CSV") {
    val wd = tmpDir()
    val cat = new EntityCatalog(Map("planets" -> planets),
      keyFields = Map("planets" -> Seq("name")))
    val msgs = StepInterpreter.evaluate(cat,
      Step.Notify("planets", "gravity < 0.5", Reporting("LOW_G", "weak gravity"))).get
    ErrorSink.writeReportBundle(msgs, s"$wd/report")
    def readSheet(sub: String) = spark.read.option("header", true)
      .option("nullValue", ErrorSink.CsvNullMarker).csv(s"$wd/report/$sub")
    val summary = readSheet("summary").collect().head
    assert(summary.getAs[String]("n_record_rejections") == "2") // Mercury, Mars
    assert(summary.getAs[String]("report_status") ==
      "File has been accepted with record rejections")
    assert(readSheet("summary_table").collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet ==
      Set(("Record Rejection", "planets", "2")))
    val agg = readSheet("aggregate").collect().head
    assert(agg.getAs[String]("Error_Code") == "LOW_G" && agg.getAs[String]("Count") == "2")
    assert(ErrorSink.readDetailCsv(spark, s"$wd/report/detail").count() == 2)
  }

  test("error-code map: flat file expands per category; own code wins; nested values skipped") {
    import spark.implicits._
    val wd = tmpDir()
    val path = s"$wd/error_codes.json"
    java.nio.file.Files.writeString(java.nio.file.Path.of(path),
      """{"name": "001", "mass": "002", "legacy": {"x": "9"}}""")
    val codes = ErrorSink.errorCodesFromJson(spark, path)
      .as[(String, String, String)].collect().toSet
    // 2 textual fields x 3 categories; the nested value contributes nothing
    assert(codes == (for {
      f <- Set("name", "mass"); c <- Set("Blank", "Wrong format", "Bad value")
    } yield (c, f, if (f == "name") "001" else "002")))
    val msgs = Seq(
      ("name", "Blank", null.asInstanceOf[String]),   // filled from map
      ("name", "Bad value", "OWN"),                   // own code wins
      ("mass", "Wrong format", null.asInstanceOf[String]), // filled
      ("other", "Blank", null.asInstanceOf[String]),  // unmapped stays null
      ("name", "Constraint", null.asInstanceOf[String]) // category not in map
    ).toDF("ReportingField", "Category", "ErrorCode")
    val out = ErrorSink.populateErrorCodes(msgs, ErrorSink.errorCodesFromJson(spark, path))
      .as[(String, String, String)].collect().toSet
    assert(out == Set(
      ("name", "Blank", "001"), ("name", "Bad value", "OWN"),
      ("mass", "Wrong format", "002"), ("other", "Blank", null),
      ("name", "Constraint", null)))
  }

  test("xlsx workbook: reference sheet structure, overflow split, valid OOXML parts") {
    import org.apache.spark.sql.Row
    val wd = tmpDir()
    val msgs = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 7).map { i =>
        Row("planets", s"key$i", "record", "error", "record", "loc",
          "msg <&> \"quoted\"", "CODE", null, i.toLong, s"v$i", "Bad value")
      }), graft.rules.Messages.schema)
    val path = ErrorSink.writeExcelReport(msgs, s"$wd/report.xlsx",
      nRecords = 100L, summaryInfo = Seq("File Name" -> "demo.csv"),
      overflow = 3L)
    // unzip and parse with the JDK only
    val zf = new java.util.zip.ZipFile(path)
    def xml(name: String): org.w3c.dom.Document = {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(true)
      f.newDocumentBuilder().parse(zf.getInputStream(zf.getEntry(name)))
    }
    val wb = xml("xl/workbook.xml")
    val sheetEls = wb.getElementsByTagNameNS("*", "sheet")
    val names = (0 until sheetEls.getLength)
      .map(i => sheetEls.item(i).getAttributes.getNamedItem("name").getNodeValue)
    // 7 detail rows at overflow 3 -> overflow+1 = 4 rows on the first
    // sheet (the reference's 0-based `row_count > overflow` trailer
    // condition), 3 on the continuation
    assert(names == Seq("Summary", "Error Summary",
      "Error Data", "Error Data_2"), names)
    def sheetRows(idx: Int): Seq[Seq[String]] = {
      val doc = xml(s"xl/worksheets/sheet$idx.xml")
      val rows = doc.getElementsByTagNameNS("*", "row")
      (0 until rows.getLength).map { r =>
        val cells = rows.item(r).asInstanceOf[org.w3c.dom.Element]
          .getElementsByTagNameNS("*", "c")
        (0 until cells.getLength).map(c => cells.item(c).getTextContent)
      }
    }
    val summary = sheetRows(1)
    assert(summary.exists(r => r.contains("Status") &&
      r.contains("File has been accepted with record rejections")))
    assert(summary.exists(r => r.contains("File Name") && r.contains("demo.csv")))
    assert(summary.exists(r => r.contains("Total Number of Records Processed") &&
      r.contains("100")))
    // Type x Table matrix: planets column, Record Rejection row counts 7
    assert(summary.exists(r => r.contains("Record Rejection") && r.contains("7")))
    // aggregate sheet: reference heading renames applied
    val agg = sheetRows(2)
    assert(agg.head == Seq("Type", "Group", "Data Item Submission Name",
      "Category", "Error Code", "Count"))
    assert(agg(1).contains("CODE") && agg(1).contains("7"))
    // detail sheets: header + overflow+1 rows + trailer on the first,
    // the remaining 3 rows and no trailer on the second; XML-escaped
    // message survives parsing; nulls render as the reference's "None"
    val d1 = sheetRows(3)
    assert(d1.head.take(3) == Seq("Entity", "Key", "FailureType"))
    assert(d1.length == 6) // header + 4 rows + trailer
    assert(d1.last.contains("Errors continued on next sheet"))
    assert(d1.exists(_.contains("msg <&> \"quoted\"")))
    assert(d1.exists(_.contains("None"))) // the null ErrorCode column
    assert(sheetRows(4).length == 4) // header + final 3 rows, no trailer
    assert(zf.getEntry("[Content_Types].xml") != null)
    assert(zf.getEntry("_rels/.rels") != null)
    assert(zf.getEntry("xl/_rels/workbook.xml.rels") != null)
    zf.close()
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
