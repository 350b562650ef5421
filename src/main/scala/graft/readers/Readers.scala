package graft.readers

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.contract.EntitySpec
import graft.rules.Messages

/** File readers producing the engine's ingest form: a STRINGIFIED frame (all
  * leaf columns string — typing happens in the contract stage) plus a 1-based
  * `__record_index__`.
  *
  * Record-index semantics follow the reference exactly
  * (ref: spark_helpers.py:489-499): `rdd.zipWithIndex`, 1-based, assigned at
  * ingest before any shuffle — NOT `monotonically_increasing_id` (which is
  * non-contiguous and partition-dependent).
  */
object Readers {

  val RecordIndexColumn: String = Messages.RecordIndexColumn

  /** Add the 1-based record index. zipWithIndex needs one pass to count
    * partition sizes; index order = file/row order at ingest. Runs at the
    * InternalRow level (no external-Row decode/encode round trip — see
    * [[org.apache.spark.sql.graft.RecordIndexBridge]]).
    */
  def addRecordIndex(df: DataFrame): DataFrame =
    addRecordIndexWithPath(df)._1

  /** [[addRecordIndex]] plus which path engaged (true = single-pass parquet
    * metadata index). Callers that fan the indexed frame into MULTIPLE
    * lineages care: the metadata index is a pure function of (file,
    * position) so re-scans agree for free, while zipWithIndex re-executed
    * by two consumers is two full double-pass scans racing shared cache
    * blocks — those callers persist IF AND ONLY IF the fallback engaged.
    */
  def addRecordIndexWithPath(df: DataFrame): (DataFrame, Boolean) = {
    if (df.columns.contains(RecordIndexColumn)) return (df, true)
    // Parquet scans get the index from `_metadata.row_index` in a single
    // pass (see [[ParquetRecordIndex]]); everything else pays zipWithIndex.
    ParquetRecordIndex.tryAddIndex(df, RecordIndexColumn) match {
      case Some(fast) => (fast, true)
      case None =>
        (org.apache.spark.sql.graft.RecordIndexBridge.zipWithRecordIndex(df, RecordIndexColumn),
          false)
    }
  }

  def dropRecordIndex(df: DataFrame): DataFrame = df.drop(RecordIndexColumn)

  /** Leaf data files under `path` in LEXICAL name order (hidden/_ files
    * skipped); `path` itself when it is a single file or doesn't resolve.
    */
  private def leafDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq(path)
    if (fs.getFileStatus(p).isFile) Seq(path)
    else fs.listStatus(p).filter(_.isFile).map(_.getPath)
      .filter(q => !q.getName.startsWith("_") && !q.getName.startsWith("."))
      .map(_.toString).sorted.toSeq
  }

  /** Record-indexed read of a possibly multi-file non-parquet input in
    * LEXICAL file order — the same order the parquet metadata path uses
    * ([[ParquetRecordIndex]]'s documented deviation), so a range-sorted
    * multi-file fixture (part-00000 < part-00001 < …, ranges ascending)
    * reads back with `__record_index__` equal to the global sort rank.
    * zipWithIndex over a multi-file scan would instead follow Spark's
    * size-descending split packing — content-dependent and unsorted.
    *
    * Each file is read, counted, and zipped separately with the running
    * offset (one extra count pass per file over zipWithIndex's own two —
    * fixture-lane inputs, not a hot path). Single-file inputs keep the
    * exact historical plan.
    */
  private def indexedLexical(spark: SparkSession, path: String)
                            (readOne: String => DataFrame): DataFrame = {
    val files = leafDataFiles(spark, path)
    if (files.lengthCompare(1) <= 0) addRecordIndex(readOne(path))
    else {
      var offset = 0L
      val parts = files.map { f =>
        val df = readOne(f)
        val n = df.count()
        val indexed = org.apache.spark.sql.graft.RecordIndexBridge
          .zipWithRecordIndex(df, RecordIndexColumn, offset)
        offset += n
        indexed
      }
      org.apache.spark.sql.graft.ExpressionBridge.flatUnion(parts)
    }
  }

  private def stringSchema(spec: EntitySpec): StructType =
    StructType(spec.fields.map(f => StructField(f.name, StringType)))

  /** CSV with the reference's reader options
    * (ref: spark/readers/csv.py:25-109 and backends/readers/csv.py:170-225):
    * declared schema (never inferred), all-string read, header handling
    * (header=false maps columns POSITIONALLY to the declared field order,
    * ref: csv.py:170-180), optional per-value trim, a `null_values` list,
    * and empty-string->null.
    */
  final case class CsvOptions(
      sep: String = ",",
      header: Boolean = true,
      quote: String = "\"",
      escape: String = "\\",
      multiLine: Boolean = false,
      encoding: String = "UTF-8",
      emptyStringAsNull: Boolean = true,
      trimValues: Boolean = false,
      nullValues: Seq[String] = Nil)

  def readCsv(spark: SparkSession, path: String, spec: EntitySpec,
              options: CsvOptions = CsvOptions()): DataFrame =
    indexedLexical(spark, path) { p =>
      val df = spark.read
        .schema(stringSchema(spec)) // positional: field order = column order
        .option("sep", options.sep)
        .option("header", options.header)
        .option("quote", options.quote)
        .option("escape", options.escape)
        .option("multiLine", options.multiLine)
        .option("encoding", options.encoding)
        .option("inferSchema", value = false)
        .csv(p)
      sanitize(df, options)
    }

  /** Value sanitisation (ref: backends/readers/csv.py:182-200): optional
    * trim, then null out configured placeholder values and empty strings.
    */
  private def sanitize(df: DataFrame, options: CsvOptions): DataFrame = {
    val needsWork = options.trimValues || options.emptyStringAsNull || options.nullValues.nonEmpty
    if (!needsWork) return df
    df.select(df.columns.map { c0 =>
      val c = col(s"`$c0`")
      val trimmed = if (options.trimValues) trim(c) else c
      val nulls = (if (options.emptyStringAsNull) Seq("") else Nil) ++ options.nullValues
      val out = if (nulls.nonEmpty)
        when(trimmed.isin(nulls: _*), lit(null).cast(StringType)).otherwise(trimmed)
      else trimmed
      out.as(c0)
    }.toIndexedSeq: _*)
  }

  /** Header-vs-schema check (ref: backends/readers/csv.py:202-225): the
    * file's header must contain every declared field (case-insensitive).
    * Returns missing names.
    */
  def checkCsvHeader(spark: SparkSession, path: String, spec: EntitySpec,
                     sep: String = ","): Seq[String] = {
    val first = spark.read.option("header", value = false).csv(path).limit(1).collect()
    val headerCols = first.headOption.map(_.toSeq.map(v => Option(v).fold("")(_.toString.trim.toLowerCase)))
      .getOrElse(Nil)
    spec.fields.map(_.name).filterNot(n => headerCols.contains(n.toLowerCase))
  }

  /** JSON (multiline or JSONL) with declared schema
    * (ref: spark/readers/json.py:23-74). Nested fields stay nested; leaves
    * are read as strings for the contract stage.
    */
  /** ORC ingest: self-describing columnar files still go through the
    * declared-schema discipline — every declared field must be present
    * (matched case-insensitively), is selected in spec order, stringified
    * into the interchange form (so `Contract.cast` applies the SAME parse
    * + validate lane as CSV/JSON/XML), and record-indexed. Extra columns in
    * the file are dropped, like the reference's column-projection readers.
    */
  def readOrc(spark: SparkSession, path: String, spec: EntitySpec): DataFrame =
    indexedLexical(spark, path) { p =>
      val df = spark.read.orc(p)
      val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
      val missing = spec.fields.map(_.name).filterNot(n => byLower.contains(n.toLowerCase))
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"ORC at $p lacks declared columns: ${missing.mkString(", ")}")
      df.select(spec.fields.map(f =>
        col(s"`${byLower(f.name.toLowerCase)}`").cast("string").as(f.name)): _*)
    }

  def readJson(spark: SparkSession, path: String, spec: EntitySpec,
               multiLine: Boolean = true): DataFrame =
    indexedLexical(spark, path) { p =>
      spark.read
        .schema(jsonSchema(spec))
        .option("multiLine", multiLine)
        .json(p)
    }

  private def jsonSchema(spec: EntitySpec): StructType = {
    def fieldType(f: graft.contract.FieldSpec): DataType = {
      val base: DataType =
        if (f.fields.nonEmpty) StructType(f.fields.map(sf => StructField(sf.name, fieldType(sf.copy(isArray = false)))))
        else StringType
      if (f.isArray) ArrayType(base) else base
    }
    StructType(spec.fields.map(f => StructField(f.name, fieldType(f))))
  }

  /** XML via Spark 4's built-in XML source (the reference uses the spark-xml
    * package + lxml, ref: spark/readers/xml.py:59-212 and
    * backends/readers/xml.py). rowTag selects the record element.
    *
    * Namespace handling mirrors the reference's strip-then-parse
    * (ref: backends/readers/xml.py:170-180, spark/readers/xml.py:160-169
    * retries with a namespaced row tag): the declared schema uses local
    * names, so `ignoreNamespace` makes prefixed documents resolve to the
    * same columns. Declared fields missing from the document come back as
    * null columns because the schema is declared, never inferred
    * (ref: spark/readers/xml.py:191-195 pads the same way).
    */
  def readXml(spark: SparkSession, path: String, spec: EntitySpec,
              rowTag: String, ignoreNamespace: Boolean = true,
              limit: Option[Int] = None): DataFrame = {
    def readOne(p: String): DataFrame = spark.read
      .format("xml")
      .schema(jsonSchema(spec))
      .option("rowTag", rowTag)
      .option("ignoreNamespace", ignoreNamespace)
      .load(p)
    // n_records_to_read (ref: readers/xml.py) — a header entity reads only
    // the first record(s) of its tag; applied before indexing so indexes
    // stay 1..n over the records actually read. Limited reads keep the
    // single-frame path (header entities are single small files; a global
    // limit across lexical per-file frames would re-order).
    limit match {
      case Some(n) => addRecordIndex(readOne(path).limit(n))
      case None    => indexedLexical(spark, path)(readOne)
    }
  }
}
