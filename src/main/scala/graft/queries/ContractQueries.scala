package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.contract.{Contract, EntitySpec, FieldFunction, FieldSpec, Repair}
import graft.readers.Readers

/** Correctness queries for the contract validate+cast operator and the
  * CSV/JSON/XML readers (record-index chain included).
  */
object ContractQueries {

  private def lineitemSubset(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Stringify -> typed cast round-trip: output must equal the original typed values.
    "q_contract_cast" -> ((s, dir) => {
      val spec = EntitySpec("lineitem", Seq(
        FieldSpec("l_orderkey", "long", mandatory = true),
        FieldSpec("l_linenumber", "long", mandatory = true),
        FieldSpec("l_quantity", "double"),
        FieldSpec("l_returnflag", "str", maxLength = Some(1)),
        FieldSpec("l_shipdate", "datetime")))
      Contract.cast(Contract.stringify(lineitemSubset(s, dir)), spec)
    }),

    // Formatted-date cast: %d/%m/%Y with a guaranteed-invalid value lane.
    "q_contract_dates" -> ((s, dir) => {
      val input = s.read.parquet(s"$dir/lineitem.parquet").select(
        col("l_orderkey").cast("string").as("l_orderkey"),
        col("l_linenumber").cast("string").as("l_linenumber"),
        when(col("l_linenumber") === 1, lit("31/02/1995"))
          .otherwise(date_format(col("l_shipdate"), "dd/MM/yyyy")).as("ship_d"))
      val spec = EntitySpec("lineitem", Seq(
        FieldSpec("l_orderkey", "long"),
        FieldSpec("l_linenumber", "long"),
        FieldSpec("ship_d", "date", format = Some("%d/%m/%Y"))))
      Contract.cast(input, spec)
    }),

    // Validation message aggregation: Blank / Bad value / Wrong format lanes.
    "q_contract_errors" -> ((s, dir) => {
      val input = s.read.parquet(s"$dir/lineitem.parquet").select(
        col("l_orderkey").cast("string").as("order_id"),
        nullif(col("l_returnflag"), lit("R")).as("flag"),
        col("l_quantity").cast("string").as("qty"),
        when(col("l_discount") > 0.08, concat(lit("x"), col("l_quantity").cast("string")))
          .otherwise(col("l_quantity").cast("string")).as("weird"))
      val spec = EntitySpec("lineitem", Seq(
        FieldSpec("order_id", "long", mandatory = true),
        FieldSpec("flag", "str", mandatory = true),
        FieldSpec("qty", "double", le = Some(BigDecimal(49))),
        FieldSpec("weird", "float")))
      Contract.validate(input, spec)
        .groupBy("ErrorLocation", "Category", "ErrorCode")
        .agg(count(lit(1)).as("n"))
    }),

    // Record index + validate + anti-join rejection protocol end-to-end.
    "q_contract_reject" -> ((s, dir) => {
      // Parquet source → the record index comes from `_metadata.row_index`
      // in-scan (ParquetRecordIndex): a pure function of (file, position),
      // so the two consumer lineages (typed + messages) can each re-scan the
      // column-pruned parquet with identical indices — no persist+count
      // barrier needed (the zipWithIndex era required one because the two
      // lineages raced to populate shared cache blocks, ~50x stall measured
      // at sf0.1). Dropping the barrier is ONLY safe on that path — if a
      // future edit to lineitemSubset adds a filter/limit and silently
      // reverts to zipWithIndex, the conditional persist below restores the
      // barrier instead of re-measuring the stall.
      val (indexed0, fastPath) =
        Readers.addRecordIndexWithPath(Contract.stringify(lineitemSubset(s, dir)))
      val indexed = if (fastPath) indexed0 else { indexed0.persist(); indexed0.count(); indexed0 }
      val spec = EntitySpec("lineitem", Seq(
        FieldSpec("l_orderkey", "long", mandatory = true),
        FieldSpec("l_linenumber", "long", mandatory = true),
        FieldSpec("l_quantity", "double", le = Some(BigDecimal(49))),
        FieldSpec("l_returnflag", "str", regex = Some("^[AN]$")),
        FieldSpec("l_shipdate", "datetime")))
      val (typed, messages) = Contract(indexed, spec)
      Contract.filterContractErrors(typed, messages)
        .select("l_orderkey", "l_linenumber")
    }),

    // Field functions (normalise/exclude_word/split/static_key) + defaults.
    "q_contract_functions" -> ((s, dir) => {
      val input = s.read.parquet(s"$dir/customer.parquet").select(
        col("c_custkey").cast("string").as("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
        col("c_name").as("cust_num"),
        col("c_mktsegment").as("no_mobile"),
        col("c_name").as("k"))
      val spec = EntitySpec("customer", Seq(
        FieldSpec("c_custkey", "long"),
        FieldSpec("seg", "str", default = Some("NONE"),
          functions = Seq(FieldFunction("normalise", kwargs = Map("capitalize" -> "true")))),
        FieldSpec("cust_num", "long",
          functions = Seq(FieldFunction("split", kwargs = Map("split_on" -> "#", "keep" -> "1")))),
        FieldSpec("no_mobile", "str",
          functions = Seq(FieldFunction("exclude_word", kwargs = Map("word" -> "mobile")))),
        FieldSpec("k", "long", functions = Seq(FieldFunction("static_key")))))
      Contract.cast(input, spec)
    }),

    // Error-detail overrides from dischema config: per-(field, category)
    // error code / level / informational flag / templated message /
    // reporting entity replace the defaults; non-overridden lanes keep the
    // default code + "<field> <message>" text.
    "q_contract_overrides" -> ((s, dir) => {
      val dischema = graft.config.Dischema.parseString(
        """{
          | "contract": {
          |  "error_details": {
          |   "qty": {"Bad value": {
          |     "error_code": "QTYRANGE", "error_level": "submission",
          |     "error_message": "quantity {{__error_value}} exceeds 49 for order {{order_id}}"}},
          |   "flag": {"Blank": {
          |     "error_code": "FLAGMISSING", "is_informational": true,
          |     "error_message": "flag missing for order {{order_id}}",
          |     "reporting_entity": "lineitem_flags"}}
          |  },
          |  "datasets": {
          |   "lineitem": {
          |    "fields": {
          |     "order_id": "int",
          |     "flag": "str",
          |     "qty": {"callable": "confloat", "constraints": {"le": 49}},
          |     "weird": "float"
          |    },
          |    "mandatory_fields": ["order_id", "flag"]
          |   }
          |  }
          | }
          |}""".stripMargin)
      val input = s.read.parquet(s"$dir/lineitem.parquet").select(
        col("l_orderkey").cast("string").as("order_id"),
        nullif(col("l_returnflag"), lit("R")).as("flag"),
        col("l_quantity").cast("string").as("qty"),
        when(col("l_discount") > 0.08, concat(lit("x"), col("l_quantity").cast("string")))
          .otherwise(col("l_quantity").cast("string")).as("weird"))
      Contract.validate(input, dischema.entities.head)
        .groupBy("Entity", "ErrorLocation", "ErrorCode", "FailureType", "Status")
        .agg(count(lit(1)).as("n"), min(col("ErrorMessage")).as("sample_msg"))
    }),

    // Function error_type routing: record_rejection -> record/error,
    // file_rejection -> submission/error, warning -> record/informational;
    // a rejecting function failure supersedes the Blank error of the value
    // it nulls (field `a` is mandatory and AUTOMOBILE rows null it).
    "q_contract_error_types" -> ((s, dir) => {
      val input = s.read.parquet(s"$dir/customer.parquet").select(
        col("c_custkey").cast("string").as("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("a"),
        col("c_mktsegment").as("b"),
        when(col("c_custkey") % 5 === 0, regexp_replace(col("c_name"), "#", "-"))
          .otherwise(col("c_name")).as("c"))
      val spec = EntitySpec("customer", Seq(
        FieldSpec("c_custkey", "long"),
        FieldSpec("a", "str", mandatory = true,
          functions = Seq(FieldFunction("exclude_word", kwargs = Map("word" -> "mobile")))),
        FieldSpec("b", "str",
          functions = Seq(FieldFunction("exclude_word", errorType = "warning",
            kwargs = Map("word" -> "mobile")))),
        FieldSpec("c", "long",
          functions = Seq(FieldFunction("split", errorType = "file_rejection",
            kwargs = Map("split_on" -> "#", "keep" -> "1"))))))
      Contract.validate(input, spec)
        .groupBy("ErrorLocation", "Status", "FailureType", "ErrorCode")
        .agg(count(lit(1)).as("n"))
    }),

    // Per-element array validation (each_item): failing elements message and
    // null out independently of the record's other elements.
    "q_contract_each_item" -> ((s, dir) => {
      val input = s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(
          when(col("l_discount") > 0.08, concat(lit("x"), col("l_quantity").cast("string")))
            .otherwise(col("l_quantity").cast("string")))).as("qtys"))
        .select(col("l_orderkey").cast("string").as("l_orderkey"), col("qtys"))
      val spec = EntitySpec("lineitem", Seq(
        FieldSpec("l_orderkey", "long"),
        FieldSpec("qtys", "double", isArray = true, le = Some(BigDecimal(45)))))
      Contract.validate(input, spec)
        .groupBy("Category", "ErrorCode").agg(count(lit(1)).as("n"))
    }),

    // Arrays of nested models validate per element, per leaf (each_item on
    // model fields): blank / wrong-format / constraint lanes at dotted paths.
    "q_contract_nested" -> ((s, dir) => {
      val input = s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          nullif(col("l_linenumber"), lit(7)).cast("string").as("ln"),
          when(col("l_discount") > 0.08, concat(lit("x"), col("l_quantity").cast("string")))
            .otherwise(col("l_quantity").cast("string")).as("qty")))).as("items"))
        .select(col("l_orderkey").cast("string").as("l_orderkey"), col("items"))
      val spec = EntitySpec("lineitem", Seq(
        FieldSpec("l_orderkey", "long"),
        FieldSpec("items", isArray = true, fields = Seq(
          FieldSpec("ln", "long", mandatory = true),
          FieldSpec("qty", "double", le = Some(BigDecimal(45)))))))
      Contract.validate(input, spec)
        .groupBy("ErrorLocation", "Category", "ErrorCode")
        .agg(count(lit(1)).as("n"))
    }),

    // CSV -> stringified + __record_index__ -> typed cast. Reader fixtures
    // (CSV/JSON/XML re-encodes of the parquet tables) build through
    // Fixtures.ensure: once per sf dir, pre-built untimed by Bench.
    "q_reader_csv" -> ((s, dir) => {
      val tmp = csvFixture(s, dir)
      val spec = EntitySpec("part", Seq(
        FieldSpec("p_partkey", "long"), FieldSpec("p_name", "str"),
        FieldSpec("p_brand", "str"), FieldSpec("p_size", "long")))
      Contract.cast(Readers.readCsv(s, tmp, spec), spec)
    }),

    // Headerless CSV: positional mapping + trim + null_values sanitisation.
    // ORC ingest through the same stringified-interchange + contract-cast
    // lane as CSV/JSON/XML (declared columns enforced, extras dropped).
    "q_reader_orc" -> ((s, dir) => {
      val tmp = orcFixture(s, dir)
      val spec = EntitySpec("supplier", Seq(
        FieldSpec("s_suppkey", "long"), FieldSpec("s_name", "str"),
        FieldSpec("s_nationkey", "long"), FieldSpec("s_acctbal", "double")))
      Contract.cast(Readers.readOrc(s, tmp, spec), spec)
    }),

    "q_reader_csv_headerless" -> ((s, dir) => {
      val tmp = csvHeaderlessFixture(s, dir)
      val spec = EntitySpec("nation", Seq(
        FieldSpec("n_nationkey", "long"), FieldSpec("n_name", "str"),
        FieldSpec("n_regionkey", "long")))
      Contract.cast(Readers.readCsv(s, tmp, spec,
        Readers.CsvOptions(header = false, trimValues = true, nullValues = Seq("NA"))), spec)
    }),

    // Namespaced XML resolves to local-name columns; missing declared
    // fields pad as nulls.
    "q_reader_xml_ns" -> ((s, dir) => {
      val tmp = xmlNsFixture(s, dir)
      val spec = EntitySpec("region", Seq(
        FieldSpec("r_regionkey", "long"), FieldSpec("r_name", "str"),
        FieldSpec("r_missing", "str")))
      Contract.cast(Readers.readXml(s, tmp, spec, rowTag = "region"), spec)
    }),

    // JSONL with declared schema.
    "q_reader_json" -> ((s, dir) => {
      val tmp = jsonFixture(s, dir)
      val spec = EntitySpec("orders", Seq(
        FieldSpec("o_orderkey", "long"), FieldSpec("o_orderpriority", "str"),
        FieldSpec("o_totalprice", "double")))
      Contract.cast(Readers.readJson(s, tmp, spec, multiLine = false), spec)
    }),

    // XSD validation: every problem reported (not fail-fast), with stable
    // Xerces error codes and source positions. The oracle is the literal
    // expected problem table.
    "q_reader_xsd" -> ((s, dir) => {
      val base = xsdFixture(s, dir)
      val problems = graft.readers.XmlLinting.validate(s"$base/regions.xml", s"$base/regions.xsd")
      import s.implicits._
      problems.map(p => (p.line.toLong, p.column.toLong,
          p.message.takeWhile(_ != ':'))) // stable Xerces code prefix
        .toDF("line", "col", "code")
    }),

    // CSV header-vs-declared-schema enforcement: declared fields missing
    // from the file's header are reported (case-insensitive). Literal oracle.
    "q_reader_header_check" -> ((s, dir) => {
      val tmp = headerCheckFixture(s, dir)
      val spec = EntitySpec("nation", Seq(
        FieldSpec("n_nationkey", "long"), FieldSpec("n_name", "str"),
        FieldSpec("n_regionkey", "long"), FieldSpec("n_comment", "str")))
      val missing = Readers.checkCsvHeader(s, tmp, spec)
      import s.implicits._
      missing.toDF("missing_field")
    }),

    // XML via Spark 4 built-in source, rowTag record shaping.
    "q_reader_xml" -> ((s, dir) => {
      val tmp = xmlFixture(s, dir)
      val spec = EntitySpec("nation", Seq(
        FieldSpec("n_nationkey", "long"), FieldSpec("n_name", "str"),
        FieldSpec("n_regionkey", "long")))
      Contract.cast(Readers.readXml(s, tmp, spec, rowTag = "nation"), spec)
    }),

    // Per-column data-quality profile in ONE aggregation pass: null,
    // blank, distinct counts and lexicographic min/max of the stringified
    // values — the submission-triage summary before writing a contract.
    "q_contract_profile" -> ((s, dir) => {
      val input = s.read.parquet(s"$dir/customer.parquet").select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
        when(col("c_custkey") % 7 === 0, lit("  ")).otherwise(col("c_name")).as("name"))
      Contract.profile(input)
    }),

    // Winsorize: clip extended prices into [p1, p99] — the outlier
    // treatment before aggregates the tails would poison.
    "q_repair_winsorize" -> ((s, dir) =>
      Repair.winsorize(s.read.parquet(s"$dir/lineitem.parquet"), "l_extendedprice")
        .select(col("l_orderkey"), col("l_linenumber"), col("lo"), col("hi"),
          round(col("repaired"), 6).as("repaired"), col("clipped"))),

    // Robust outliers on event values: median/MAD z-score, breakdown-safe.
    "q_repair_outliers" -> ((s, dir) =>
      Repair.robustOutliers(CoreQueries.loadEvents(s, dir), "value")
        .select(col("event_id"), col("med"), col("mad"),
          col("abs_dev"), col("is_outlier"))),

    // Schema-drift guard: rules mined from the even-custkey snapshot,
    // violations counted on the odd-custkey snapshot with injected drift
    // (N/A in a double column, nulls in a complete date column, a never-
    // seen enum value).
    "q_contract_drift" -> ((s, dir) => {
      val base = s.read.parquet(s"$dir/customer.parquet").select(
        col("c_custkey"),
        col("c_mktsegment").as("seg"),
        when(col("c_custkey") % 9 === 0, lit(null)).otherwise(col("c_name")).as("name"),
        concat(col("c_custkey").cast("string"), lit("."),
          (col("c_custkey") % 100).cast("string")).as("amount"),
        concat(lit("2024-"), lpad((col("c_custkey") % 12 + 1).cast("string"), 2, "0"),
          lit("-15")).as("period"))
      val ref = base.where(col("c_custkey") % 2 === 0)
      val fresh = base.where(col("c_custkey") % 2 === 1)
        .withColumn("seg", when(col("c_custkey") % 17 === 0, "NEWSEG").otherwise(col("seg")))
        .withColumn("amount", when(col("c_custkey") % 31 === 0, "N/A").otherwise(col("amount")))
        .withColumn("period", when(col("c_custkey") % 13 === 0, lit(null)).otherwise(col("period")))
      Contract.validateAgainstSuggested(ref, fresh)
    }),

    // Contract rule suggestion over a mixed-typed stringified submission:
    // int / float-string / ISO-date / enum / nullable free-text columns,
    // each mined back to the dischema a human would write.
    "q_contract_suggest" -> ((s, dir) => {
      val input = s.read.parquet(s"$dir/customer.parquet").select(
        col("c_custkey"),
        col("c_mktsegment").as("seg"),
        when(col("c_custkey") % 9 === 0, lit(null)).otherwise(col("c_name")).as("name"),
        concat(col("c_custkey").cast("string"), lit("."),
          (col("c_custkey") % 100).cast("string")).as("amount"),
        concat(lit("2024-"), lpad((col("c_custkey") % 12 + 1).cast("string"), 2, "0"),
          lit("-15")).as("period"))
      Contract.suggestRules(input)
    }),

    // nhsnumber vs permissivenhsno semantics (ref: domain_types.py:98,
    // 166-174): both enforce the mod-11 checksum, but only nhsnumber emits
    // the sentinel / starts-with-9 / palindrome informational warnings —
    // the permissive type defaults warn_on_test_numbers to False. Fixed
    // test values per custkey bucket: three warning shapes, one clean
    // valid, one checksum failure.
    "q_contract_nhs_permissive" -> ((s, dir) => {
      val nhs = when(col("c_custkey") % 6 === 0, lit("9999999999")) // sentinel (valid checksum)
        .when(col("c_custkey") % 6 === 1, lit("0000000000"))        // sentinel (valid checksum)
        .when(col("c_custkey") % 6 === 2, lit("0000110000"))        // valid palindrome
        .when(col("c_custkey") % 6 === 3, lit("9434765919"))        // valid, starts with 9
        .when(col("c_custkey") % 6 === 4, lit("1234567881"))        // valid, no warning
        .otherwise(lit("1234567890"))                               // checksum failure
      val input = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").cast("string").as("c_custkey"), nhs.as("nhs"))
      def lane(tn: String, label: String) =
        Contract.validate(input, EntitySpec("customer", Seq(
          FieldSpec("c_custkey", "long"), FieldSpec("nhs", tn))))
          .withColumn("lane", lit(label))
      lane("nhsnumber", "strict").unionByName(lane("permissivenhsno", "permissive"))
        .groupBy("lane", "ErrorCode", "Status", "FailureType", "ErrorMessage", "Value")
        .agg(count(lit(1)).as("n"))
    })
  )

  private def orcFixture(s: SparkSession, dir: String): String = {
    val tmp = "/tmp/graft_q_reader_orc"
    Fixtures.ensure(tmp, dir) {
      Fixtures.sorted(
          s.read.parquet(s"$dir/supplier.parquet")
            .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
          "s_suppkey", Fixtures.writeParts(s, s"$dir/supplier.parquet"))
        .write.mode("overwrite").orc(tmp)
    }
    tmp
  }

  private def csvFixture(s: SparkSession, dir: String): String = {
    val tmp = "/tmp/graft_q_reader_csv"
    Fixtures.ensure(tmp, dir) {
      Fixtures.sorted(
          s.read.parquet(s"$dir/part.parquet")
            .select("p_partkey", "p_name", "p_brand", "p_size"),
          "p_partkey", Fixtures.writeParts(s, s"$dir/part.parquet"))
        .write.mode("overwrite").option("header", value = true).csv(tmp)
    }
    tmp
  }

  private def csvHeaderlessFixture(s: SparkSession, dir: String): String = {
    val tmp = "/tmp/graft_q_reader_csv_headerless"
    Fixtures.ensure(tmp, dir) {
      s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"), concat(lit("  "), col("n_name"), lit(" ")).as("n_name"),
          when(col("n_regionkey") === 0, lit("NA"))
            .otherwise(col("n_regionkey").cast("string")).as("n_regionkey"))
        .transform(Fixtures.sorted(_, "n_nationkey",
          Fixtures.writeParts(s, s"$dir/nation.parquet")))
        .write.mode("overwrite").option("header", value = false).csv(tmp)
    }
    tmp
  }

  private def xmlNsFixture(s: SparkSession, dir: String): String = {
    val tmp = "/tmp/graft_q_reader_xml_ns/region.xml"
    Fixtures.ensure(tmp, dir) {
      val regions = s.read.parquet(s"$dir/region.parquet")
        .sort("r_regionkey").collect()
      val body = regions.map(r =>
        s"  <ns:region><ns:r_regionkey>${r.get(0)}</ns:r_regionkey>" +
          s"<ns:r_name>${r.get(1)}</ns:r_name></ns:region>").mkString("\n")
      val xml = s"""<ns:regions xmlns:ns="http://example.org/r">\n$body\n</ns:regions>"""
      val f = new java.io.File(tmp)
      f.getParentFile.mkdirs()
      java.nio.file.Files.writeString(f.toPath, xml)
    }
    tmp
  }

  private def jsonFixture(s: SparkSession, dir: String): String = {
    val tmp = "/tmp/graft_q_reader_json"
    Fixtures.ensure(tmp, dir) {
      Fixtures.sorted(
          s.read.parquet(s"$dir/orders.parquet")
            .select("o_orderkey", "o_orderpriority", "o_totalprice"),
          "o_orderkey", Fixtures.writeParts(s, s"$dir/orders.parquet"))
        .write.mode("overwrite").json(tmp)
    }
    tmp
  }

  private def xsdFixture(s: SparkSession, dir: String): String = {
    val base = "/tmp/graft_q_reader_xsd"
    Fixtures.ensure(base, dir) {
      new java.io.File(base).mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$base/regions.xml"),
        """<regions>
          |  <region><r_regionkey>0</r_regionkey><r_name>AFRICA</r_name></region>
          |  <region><r_regionkey>x</r_regionkey><r_name>AMERICA</r_name></region>
          |  <region><r_name>ASIA</r_name></region>
          |</regions>
          |""".stripMargin)
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$base/regions.xsd"),
        """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          |  <xs:element name="regions">
          |    <xs:complexType><xs:sequence>
          |      <xs:element name="region" maxOccurs="unbounded">
          |        <xs:complexType><xs:sequence>
          |          <xs:element name="r_regionkey" type="xs:integer"/>
          |          <xs:element name="r_name" type="xs:string"/>
          |        </xs:sequence></xs:complexType>
          |      </xs:element>
          |    </xs:sequence></xs:complexType>
          |  </xs:element>
          |</xs:schema>
          |""".stripMargin)
    }
    base
  }

  private def headerCheckFixture(s: SparkSession, dir: String): String = {
    val tmp = "/tmp/graft_q_reader_header_check"
    Fixtures.ensure(tmp, dir) {
      s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey").as("N_NATIONKEY"), col("n_name"),
          col("n_regionkey").as("unexpected_extra"))
        // single file by design: the query under test reads the HEADER of a
        // submission (one-file ingest unit), and nation is KB-sized at
        // every scale factor — not a scale-limited write
        .coalesce(1)
        .write.mode("overwrite").option("header", value = true).csv(tmp)
    }
    tmp
  }

  private def xmlFixture(s: SparkSession, dir: String): String = {
    val tmp = "/tmp/graft_q_reader_xml"
    Fixtures.ensure(tmp, dir) {
      Fixtures.sorted(
          s.read.parquet(s"$dir/nation.parquet")
            .select("n_nationkey", "n_name", "n_regionkey"),
          "n_nationkey", Fixtures.writeParts(s, s"$dir/nation.parquet"))
        .write.mode("overwrite").format("xml")
        .option("rowTag", "nation").option("rootTag", "nations").save(tmp)
    }
    tmp
  }

  /** Fixture builders for the untimed pre-bench pass. */
  private[graft] val fixtures: Seq[(SparkSession, String) => Unit] = Seq(
    (s, d) => { csvFixture(s, d); () },
    (s, d) => { csvHeaderlessFixture(s, d); () },
    (s, d) => { xmlNsFixture(s, d); () },
    (s, d) => { jsonFixture(s, d); () },
    (s, d) => { xsdFixture(s, d); () },
    (s, d) => { headerCheckFixture(s, d); () },
    (s, d) => { xmlFixture(s, d); () },
    (s, d) => { orcFixture(s, d); () })

  val oracleSql: Map[String, String] = Map(
    "q_contract_cast" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate FROM lineitem",
    "q_contract_dates" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN l_linenumber = 1 THEN NULL ELSE CAST(l_shipdate AS DATE) END AS ship_d FROM lineitem"),
    "q_contract_errors" ->
      ("SELECT * FROM (" +
        "SELECT 'flag' AS ErrorLocation, 'Blank' AS Category, 'FieldBlank' AS ErrorCode, count(1) AS n " +
        "FROM lineitem WHERE l_returnflag = 'R' " +
        "UNION ALL SELECT 'qty', 'Bad value', 'BadValue', count(1) FROM lineitem WHERE l_quantity > 49 " +
        // parse failures are 'Bad value' like every non-Blank error
        // (ref: message.py:253-256)
        "UNION ALL SELECT 'weird', 'Bad value', 'BadValue', count(1) FROM lineitem WHERE l_discount > 0.08) t"),
    "q_contract_reject" ->
      ("SELECT l_orderkey, l_linenumber FROM lineitem " +
        "WHERE l_quantity <= 49 AND l_returnflag IN ('A', 'N')"),
    "q_contract_functions" ->
      ("SELECT c_custkey, " +
        "CASE WHEN c_mktsegment = 'BUILDING' THEN 'None' " +
        "ELSE upper(substring(c_mktsegment, 1, 1)) || lower(substring(c_mktsegment, 2)) END AS seg, " +
        "CAST(string_split(c_name, '#')[2] AS BIGINT) AS cust_num, " +
        "CASE WHEN contains(lower(c_mktsegment), 'mobile') THEN NULL ELSE c_mktsegment END AS no_mobile, " +
        "CAST(1 AS BIGINT) AS k " +
        "FROM customer"),
    // Replicates the Spark side's sort_array element order to pin the
    // 0-based element INDEX in each location (items.<i>.<leaf>) — struct
    // sort = (ln, qty) ascending, nulls first, binary string order.
    "q_contract_nested" ->
      ("WITH its AS (SELECT l_orderkey, " +
        "CASE WHEN l_linenumber = 7 THEN NULL ELSE CAST(l_linenumber AS VARCHAR) END AS ln, " +
        "CASE WHEN l_discount > 0.08 THEN 'x' || CAST(l_quantity AS VARCHAR) " +
        "ELSE CAST(l_quantity AS VARCHAR) END AS qty FROM lineitem), " +
        "pos AS (SELECT l_orderkey, ln, qty, " +
        "row_number() OVER (PARTITION BY l_orderkey ORDER BY ln ASC NULLS FIRST, qty ASC NULLS FIRST) - 1 AS p " +
        "FROM its) " +
        "SELECT * FROM (" +
        "SELECT 'items.' || p || '.ln' AS ErrorLocation, 'Blank' AS Category, " +
        "'FieldBlank' AS ErrorCode, count(1) AS n FROM pos WHERE ln IS NULL GROUP BY 1 " +
        // parse and constraint failures share the 'Bad value' lane, so per
        // location they aggregate into ONE row
        "UNION ALL SELECT 'items.' || p || '.qty', 'Bad value', 'BadValue', count(1) " +
        "FROM pos WHERE qty LIKE 'x%' OR TRY_CAST(qty AS DOUBLE) > 45 GROUP BY 1) t"),
    "q_contract_overrides" ->
      ("SELECT * FROM (" +
        "SELECT 'lineitem' AS Entity, 'qty' AS ErrorLocation, 'QTYRANGE' AS ErrorCode, " +
        "'submission' AS FailureType, 'error' AS Status, count(1) AS n, " +
        "min('quantity ' || CAST(l_quantity AS VARCHAR) || ' exceeds 49 for order ' || CAST(l_orderkey AS VARCHAR)) AS sample_msg " +
        "FROM lineitem WHERE l_quantity > 49 " +
        "UNION ALL SELECT 'lineitem_flags', 'flag', 'FLAGMISSING', 'record', 'informational', count(1), " +
        "min('flag missing for order ' || CAST(l_orderkey AS VARCHAR)) " +
        "FROM lineitem WHERE l_returnflag = 'R' " +
        "UNION ALL SELECT 'lineitem', 'weird', 'BadValue', 'record', 'error', count(1), " +
        "min('is invalid') FROM lineitem WHERE l_discount > 0.08) t"),
    "q_contract_error_types" ->
      ("SELECT * FROM (" +
        "SELECT 'a' AS ErrorLocation, 'error' AS Status, 'record' AS FailureType, " +
        "'FieldBlank' AS ErrorCode, count(1) AS n FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "UNION ALL SELECT 'a', 'error', 'record', 'BadValue', count(1) " +
        "FROM customer WHERE contains(lower(c_mktsegment), 'mobile') " +
        // warn-only function failures ride the warning lane: 'Wrong format'
        // default code (ref: validation.py:131-147)
        "UNION ALL SELECT 'b', 'informational', 'record', 'WrongFormat', count(1) " +
        "FROM customer WHERE contains(lower(c_mktsegment), 'mobile') " +
        "UNION ALL SELECT 'c', 'error', 'submission', 'BadValue', count(1) " +
        "FROM customer WHERE c_custkey % 5 = 0) t"),
    "q_contract_each_item" ->
      ("SELECT * FROM (" +
        "SELECT 'Bad value' AS Category, 'BadValue' AS ErrorCode, count(1) AS n " +
        "FROM lineitem WHERE (l_discount <= 0.08 AND l_quantity > 45) OR l_discount > 0.08) t"),
    "q_reader_xsd" ->
      ("SELECT * FROM (VALUES " +
        "(3::BIGINT, 39::BIGINT, 'cvc-datatype-valid.1.2.1'), " +
        "(3::BIGINT, 39::BIGINT, 'cvc-type.3.1.3'), " +
        "(4::BIGINT, 19::BIGINT, 'cvc-complex-type.2.4.a')) t(line, col, code)"),
    "q_reader_header_check" ->
      "SELECT * FROM (VALUES ('n_regionkey'), ('n_comment')) t(missing_field)",
    "q_reader_csv" ->
      ("SELECT p_partkey, p_name, p_brand, CAST(p_size AS BIGINT) AS p_size, " +
        "row_number() OVER (ORDER BY p_partkey) AS __record_index__ FROM part"),
    "q_reader_orc" ->
      ("SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey, " +
        "s_acctbal, row_number() OVER (ORDER BY s_suppkey) AS __record_index__ " +
        "FROM supplier"),
    "q_reader_csv_headerless" ->
      ("SELECT n_nationkey, n_name, " +
        "CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END AS n_regionkey, " +
        "row_number() OVER (ORDER BY n_nationkey) AS __record_index__ FROM nation"),
    "q_reader_xml_ns" ->
      ("SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name, " +
        "CAST(NULL AS VARCHAR) AS r_missing, " +
        "row_number() OVER (ORDER BY r_regionkey) AS __record_index__ FROM region"),
    "q_reader_json" ->
      ("SELECT o_orderkey, o_orderpriority, o_totalprice, " +
        "row_number() OVER (ORDER BY o_orderkey) AS __record_index__ FROM orders"),
    "q_reader_xml" ->
      ("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey, " +
        "row_number() OVER (ORDER BY n_nationkey) AS __record_index__ FROM nation"),
    "q_contract_profile" -> {
      def one(name: String, c: String) =
        s"SELECT '$name' AS \"column\", count(1) - count($c) AS n_nulls, " +
          s"count(CASE WHEN trim(CAST($c AS VARCHAR)) = '' THEN 1 END) AS n_blank, " +
          s"count(DISTINCT CAST($c AS VARCHAR)) AS n_distinct, " +
          s"min(CAST($c AS VARCHAR)) AS min_value, max(CAST($c AS VARCHAR)) AS max_value FROM i"
      "WITH i AS (SELECT c_custkey, " +
        "CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END AS seg, " +
        "CASE WHEN c_custkey % 7 = 0 THEN '  ' ELSE c_name END AS name FROM customer) " +
        s"SELECT * FROM (${one("c_custkey", "c_custkey")} UNION ALL " +
        s"${one("seg", "seg")} UNION ALL ${one("name", "name")}) t"
    },

    "q_repair_winsorize" ->
      ("WITH b AS (SELECT CAST(round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.01), 6) AS DOUBLE) AS lo, " +
        "CAST(round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), 6) AS DOUBLE) AS hi FROM lineitem) " +
        "SELECT l_orderkey, l_linenumber, lo, hi, " +
        "CAST(round(least(greatest(CAST(l_extendedprice AS DOUBLE), lo), hi), 6) AS DOUBLE) AS repaired, " +
        "(CAST(l_extendedprice AS DOUBLE) < lo OR CAST(l_extendedprice AS DOUBLE) > hi) AS clipped " +
        "FROM lineitem, b"),
    "q_repair_outliers" ->
      ("WITH m AS (SELECT CAST(round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS DOUBLE) AS med FROM events), " +
        "d AS (SELECT CAST(round(quantile_cont(abs(CAST(value AS DOUBLE) - med), 0.5), 6) AS DOUBLE) AS mad FROM events, m) " +
        "SELECT event_id, med, mad, CAST(round(abs(CAST(value AS DOUBLE) - med), 6) AS DOUBLE) AS abs_dev, " +
        "round(abs(CAST(value AS DOUBLE) - med), 6) > 3 * mad AS is_outlier FROM events, m, d"),

    // the mined rules are data-stable on this corpus, so the oracle holds
    // them fixed (long/enum/nullable-str/double/date) and recomputes the
    // violation counts; a rule change would fail the hash loudly
    "q_contract_drift" -> {
      val floatRe = "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
      val dateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
      "WITH i AS (SELECT c_custkey, c_mktsegment AS seg, " +
        "CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_name END AS name, " +
        "CAST(c_custkey AS VARCHAR) || '.' || CAST(c_custkey % 100 AS VARCHAR) AS amount, " +
        "'2024-' || lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0') || '-15' AS period FROM customer), " +
        "fr AS (SELECT c_custkey, CASE WHEN c_custkey % 17 = 0 THEN 'NEWSEG' ELSE seg END AS seg, name, " +
        "CASE WHEN c_custkey % 31 = 0 THEN 'N/A' ELSE amount END AS amount, " +
        "CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE period END AS period FROM i WHERE c_custkey % 2 = 1), " +
        "refseg AS (SELECT DISTINCT trim(seg) AS seg FROM i WHERE c_custkey % 2 = 0), " +
        "u AS (" +
        "SELECT 'c_custkey' AS col, 'long' AS st, 0::BIGINT AS tv, " +
        "(SELECT count(CASE WHEN c_custkey IS NULL THEN 1 END) FROM fr)::BIGINT AS nv, 0::BIGINT AS ev " +
        "UNION ALL SELECT 'seg', 'str', 0, " +
        "(SELECT count(CASE WHEN seg IS NULL OR trim(seg) = '' THEN 1 END) FROM fr), " +
        "(SELECT count(CASE WHEN trim(seg) != '' AND trim(seg) NOT IN (SELECT seg FROM refseg) THEN 1 END) FROM fr) " +
        "UNION ALL SELECT 'name', 'str', 0, 0, 0 " +
        s"UNION ALL SELECT 'amount', 'double', " +
        s"(SELECT count(CASE WHEN trim(amount) != '' AND NOT regexp_matches(amount, '$floatRe') THEN 1 END) FROM fr), " +
        "(SELECT count(CASE WHEN amount IS NULL OR trim(amount) = '' THEN 1 END) FROM fr), 0 " +
        s"UNION ALL SELECT 'period', 'date', " +
        s"(SELECT count(CASE WHEN period IS NOT NULL AND trim(period) != '' AND NOT regexp_matches(period, '$dateRe') THEN 1 END) FROM fr), " +
        "(SELECT count(CASE WHEN period IS NULL OR trim(period) = '' THEN 1 END) FROM fr), 0) " +
        "SELECT col AS \"column\", st AS suggested_type, tv AS n_type_violations, " +
        "nv AS n_null_violations, ev AS n_enum_violations, (tv + nv + ev) > 0 AS drifted FROM u"
    },

    "q_contract_suggest" -> {
      val intRe = "^[+-]?[0-9]+$"
      val floatRe = "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
      val dateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
      def one(name: String, c: String) =
        s"SELECT '$name' AS \"column\", " +
          s"count(1) - count($c) AS n_nulls, " +
          s"count(CASE WHEN trim(CAST($c AS VARCHAR)) = '' THEN 1 END) AS n_blank, " +
          s"count(CASE WHEN trim(CAST($c AS VARCHAR)) != '' THEN 1 END) AS np, " +
          s"count(CASE WHEN regexp_matches(CAST($c AS VARCHAR), '$intRe') THEN 1 END) AS i_ok, " +
          s"count(CASE WHEN regexp_matches(CAST($c AS VARCHAR), '$floatRe') THEN 1 END) AS f_ok, " +
          s"count(CASE WHEN regexp_matches(CAST($c AS VARCHAR), '$dateRe') THEN 1 END) AS d_ok, " +
          s"count(DISTINCT CASE WHEN trim(CAST($c AS VARCHAR)) != '' THEN trim(CAST($c AS VARCHAR)) END) AS nd, " +
          s"coalesce(max(CASE WHEN trim(CAST($c AS VARCHAR)) != '' THEN length(CAST($c AS VARCHAR)) END), 0) AS ml FROM i"
      "WITH i AS (SELECT c_custkey, c_mktsegment AS seg, " +
        "CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_name END AS name, " +
        "CAST(c_custkey AS VARCHAR) || '.' || CAST(c_custkey % 100 AS VARCHAR) AS amount, " +
        "'2024-' || lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0') || '-15' AS period FROM customer), " +
        s"u AS (${one("c_custkey", "c_custkey")} UNION ALL ${one("seg", "seg")} UNION ALL " +
        s"${one("name", "name")} UNION ALL ${one("amount", "amount")} UNION ALL ${one("period", "period")}) " +
        "SELECT \"column\", CASE WHEN np = 0 THEN 'str' WHEN i_ok = np THEN 'long' " +
        "WHEN f_ok = np THEN 'double' WHEN d_ok = np THEN 'date' ELSE 'str' END AS suggested_type, " +
        "(n_nulls + n_blank) > 0 AS nullable, " +
        "(CASE WHEN np = 0 THEN 'str' WHEN i_ok = np THEN 'long' WHEN f_ok = np THEN 'double' " +
        "WHEN d_ok = np THEN 'date' ELSE 'str' END) = 'str' AND np > 0 AND nd <= 10 AS enum_candidate, " +
        "nd::BIGINT AS n_distinct, ml::BIGINT AS max_length FROM u"
    },

    // test-number warnings ride the warning lane (WrongFormat code, the
    // warning's own text, ref: validation.py:131-147); the checksum failure
    // is an ordinary pydantic error (BadValue / "is invalid")
    "q_contract_nhs_permissive" ->
      ("WITH c AS (SELECT c_custkey % 6 AS b FROM customer) SELECT * FROM (" +
        "SELECT 'strict' AS lane, 'WrongFormat' AS ErrorCode, 'informational' AS Status, 'record' AS FailureType, " +
        "'NHS number possibly invalid (returned by MPS to indicate multiple matches)' AS ErrorMessage, " +
        "'9999999999' AS Value, count(1) AS n FROM c WHERE b = 0 " +
        "UNION ALL SELECT 'strict', 'WrongFormat', 'informational', 'record', " +
        "'NHS number possibly invalid (returned by MPS to indicate no match)', '0000000000', count(1) FROM c WHERE b = 1 " +
        "UNION ALL SELECT 'strict', 'WrongFormat', 'informational', 'record', " +
        "'NHS number possibly invalid (NHS number is a palindrome: this indicates a test number)', '0000110000', count(1) FROM c WHERE b = 2 " +
        "UNION ALL SELECT 'strict', 'WrongFormat', 'informational', 'record', " +
        "'NHS number possibly invalid (NHS number starts with ''9'': this indicates a test number)', '9434765919', count(1) FROM c WHERE b = 3 " +
        "UNION ALL SELECT 'strict', 'BadValue', 'error', 'record', 'is invalid', '1234567890', count(1) FROM c WHERE b = 5 " +
        "UNION ALL SELECT 'permissive', 'BadValue', 'error', 'record', 'is invalid', '1234567890', count(1) FROM c WHERE b = 5) t")
  )
}
