package graft.readers

import graft.SparkSpec
import graft.contract.{EntitySpec, FieldSpec}

class ReadersSpec extends SparkSpec {

  private def tmpFile(name: String, content: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_readers_")
    val f = d.resolve(name)
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  private val spec = EntitySpec("people", Seq(
    FieldSpec("id", "long"), FieldSpec("name", "str"), FieldSpec("city", "str")))

  test("headerless CSV maps columns positionally to the declared field order") {
    val p = tmpFile("people.csv", "1,ada,london\n2,grace,york\n")
    val df = Readers.readCsv(spark, p, spec, Readers.CsvOptions(header = false))
    assert(df.columns.toSeq == Seq("id", "name", "city", Readers.RecordIndexColumn))
    assert(rows(df.select("id", "name", "city")) ==
      Set(Seq("1", "ada", "london"), Seq("2", "grace", "york")))
  }

  test("readers accept URI-scheme paths (Hadoop FileSystem routing)") {
    // the reference routes URIs to pluggable filesystems (local/S3/DBFS,
    // ref: parser/file_handling/service.py:83-95); Spark's Hadoop FS layer
    // does the same by scheme — assert the scheme-qualified form works end
    // to end through the reader (s3a://... takes the identical path)
    val p = tmpFile("people.csv", "1,ada,london\n2,grace,york\n")
    val df = Readers.readCsv(spark, s"file://$p", spec, Readers.CsvOptions(header = false))
    assert(df.count() == 2)
    assert(rows(df.select("id", "name")) == Set(Seq("1", "ada"), Seq("2", "grace")))
  }

  test("headered CSV skips the header row; record index is 1-based in file order") {
    val p = tmpFile("people.csv", "id,name,city\n1,ada,london\n2,grace,york\n")
    val df = Readers.readCsv(spark, p, spec)
    assert(df.count() == 2)
    assert(rows(df.select("name", Readers.RecordIndexColumn)) ==
      Set(Seq("ada", 1L), Seq("grace", 2L)))
  }

  test("null_values list and trim sanitise values") {
    val p = tmpFile("people.csv", "1,  ada  ,NA\n2,n/a, york \n")
    val df = Readers.readCsv(spark, p, spec,
      Readers.CsvOptions(header = false, trimValues = true, nullValues = Seq("NA", "n/a")))
    assert(rows(df.select("name", "city")) ==
      Set(Seq("ada", null), Seq(null, "york")))
  }

  test("checkCsvHeader reports declared fields missing from the file header") {
    val p = tmpFile("people.csv", "id,nom\n1,ada\n")
    assert(Readers.checkCsvHeader(spark, p, spec) == Seq("name", "city"))
  }

  test("XML with namespace prefixes resolves to local-name columns") {
    val p = tmpFile("people.xml",
      """<ns:people xmlns:ns="http://example.org/x">
        |  <ns:person><ns:id>1</ns:id><ns:name>ada</ns:name><ns:city>london</ns:city></ns:person>
        |  <ns:person><ns:id>2</ns:id><ns:name>grace</ns:name><ns:city>york</ns:city></ns:person>
        |</ns:people>""".stripMargin)
    val df = Readers.readXml(spark, p, spec, rowTag = "person")
    assert(rows(df.select("id", "name", "city")) ==
      Set(Seq("1", "ada", "london"), Seq("2", "grace", "york")))
  }

  test("declared fields missing from the XML pad as null columns") {
    val p = tmpFile("people.xml",
      """<people>
        |  <person><id>1</id><name>ada</name></person>
        |</people>""".stripMargin)
    val df = Readers.readXml(spark, p, spec, rowTag = "person")
    assert(df.columns.toSeq == Seq("id", "name", "city", Readers.RecordIndexColumn))
    assert(rows(df.select("id", "name", "city")) == Set(Seq("1", "ada", null)))
  }

  test("ORC ingest enforces declared columns case-insensitively and drops extras") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_").toString + "/t"
    Seq((1L, "ada", "london", "extra"), (2L, "alan", "manchester", "extra"))
      .toDF("ID", "Name", "city", "unrelated")
      .coalesce(1).sortWithinPartitions(col("ID")).write.orc(dir)
    val df = Readers.readOrc(spark, dir, spec)
    assert(df.columns.toSeq == Seq("id", "name", "city", Readers.RecordIndexColumn))
    assert(df.schema.fields.take(3).forall(_.dataType.typeName == "string"))
    assert(rows(df.select("id", "name", "city")) ==
      Set(Seq("1", "ada", "london"), Seq("2", "alan", "manchester")))
    val bad = intercept[IllegalArgumentException] {
      Readers.readOrc(spark, dir,
        EntitySpec("people", spec.fields :+ FieldSpec("missing_col", "str")))
    }
    assert(bad.getMessage.contains("missing_col"))
  }
}
