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

  test("multi-file CSV dir: record index follows LEXICAL file order, 1-based contiguous") {
    val d = java.nio.file.Files.createTempDirectory("graft_readers_multi_")
    // deliberately size-skewed: Spark's split packing would order the BIG
    // file first; lexical order must win for range-sorted fixture layouts
    java.nio.file.Files.writeString(d.resolve("part-00000.csv"), "1,ada,london\n")
    java.nio.file.Files.writeString(d.resolve("part-00001.csv"),
      (2 to 40).map(i => s"$i,name$i,city$i").mkString("", "\n", "\n"))
    java.nio.file.Files.writeString(d.resolve("part-00002.csv"), "41,zed,oslo\n")
    java.nio.file.Files.writeString(d.resolve("_marker"), "ignored")
    val df = Readers.readCsv(spark, d.toString, spec, Readers.CsvOptions(header = false))
    val got = df.select("id", Readers.RecordIndexColumn).collect()
      .map(r => (r.getString(0).toLong, r.getLong(1))).toSet
    assert(got == (1L to 41L).map(i => (i, i)).toSet)
  }

  test("multi-file JSONL dir matches row_number over the range-sort key") {
    import org.apache.spark.sql.functions.col
    val d = java.nio.file.Files.createTempDirectory("graft_readers_multi_json_")
    val src = spark.range(1, 101).selectExpr("id", "concat('n', id) AS name", "'x' AS city")
    graft.queries.Fixtures.sorted(src.toDF(), "id", 4)
      .write.mode("overwrite").json(d.toString)
    val n = new java.io.File(d.toString).listFiles().count(_.getName.endsWith(".json"))
    assert(n == 4, s"expected 4 range files, got $n")
    val df = Readers.readJson(spark, d.toString, spec, multiLine = false)
    val bad = df.where(col("id").cast("long") =!= col(Readers.RecordIndexColumn)).count()
    assert(bad == 0, "record index must equal rank by the range-sort key")
    assert(df.count() == 100)
  }
}
