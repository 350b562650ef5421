package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config.Dischema
import graft.contract.Contract
import graft.readers.Readers
import graft.rules.{EntityCatalog, SyncFilters}

/** End-to-end dischema execution: JSON config -> contract (validate + cast +
  * record rejection) -> business rules (complex rules from a rule store, then
  * root rule with sync filters) -> final entity. The whole path a reference
  * user exercises with a dischema document.
  */
object DischemaQueries {

  /** Customer pipeline over the driver's TPC-H-ish tables, configured
    * entirely from JSON. Includes: named/callable type resolution, a
    * contract rejection lane (negative balances fail `ge`), refdata join,
    * a templated rule-store filter, a complex rule, and sync filters.
    */
  private[graft] def dischemaJson: String =
    """{
      | "contract": {
      |  "types": {
      |   "Balance": {"callable": "confloat", "constraints": {"ge": 0}}
      |  },
      |  "datasets": {
      |   "customer": {
      |    "fields": {
      |     "c_custkey": "int",
      |     "c_name": "str",
      |     "c_nationkey": "int",
      |     "c_acctbal": {"type": "Balance"},
      |     "c_mktsegment": "str"
      |    },
      |    "key_field": "c_custkey",
      |    "mandatory_fields": ["c_custkey", "c_name"]
      |   }
      |  }
      | },
      | "transformations": {
      |  "reference_data": {"nation": {"type": "filename", "filename": "nation.parquet"}},
      |  "rule_stores": [{"store_type": "json", "filename": "store.json"}],
      |  "rules": [
      |   {"operation": "left_join", "entity": "customer", "target": "refdata_nation",
      |    "join_condition": "customer.c_nationkey = refdata_nation.n_nationkey",
      |    "new_columns": {"refdata_nation.n_name": "nation_name"}},
      |   {"operation": "add", "entity": "customer", "column_name": "bal_band",
      |    "expression": "CASE WHEN c_acctbal > 5000 THEN 'high' ELSE 'low' END"}
      |  ],
      |  "filters": [
      |   {"entity": "customer", "name": "bal_cap", "expression": "c_acctbal <= 9000",
      |    "error_code": "HIGH_BAL", "failure_message": "balance too high",
      |    "reporting_field": "c_acctbal"},
      |   {"rule_name": "field_over_1000",
      |    "parameters": {"entity": "customer", "field": "c_acctbal"}}
      |  ],
      |  "complex_rules": [{"rule_name": "add_and_remove", "parameters": {"entity": "customer"}}]
      | }
      |}""".stripMargin

  private[graft] def ruleStoreJson: String =
    """{
      | "field_over_1000": {
      |  "type": "filter",
      |  "rule_config": {
      |   "entity": "{{entity}}",
      |   "name": "high_{{field}}",
      |   "expression": "{{field}} IS NOT NULL AND {{field}} > 1000",
      |   "failure_message": "{{failure_message or 'Field is low'}}",
      |   "error_code": "{{error_code|default(('high_' + field).upper())}}",
      |   "reporting_field": "{{reporting_field or repr(field)}}"
      |  }
      | },
      | "add_and_remove": {
      |  "type": "complex_rule",
      |  "rule_config": {
      |   "rules": [{"operation": "add", "entity": "{{entity}}",
      |              "column_name": "lit_one", "expression": "1"}],
      |   "filters": [{"entity": "{{entity}}", "expression": "lit_one = 1"}],
      |   "post_filter_rules": [{"operation": "remove", "entity": "{{entity}}",
      |                          "column_name": "lit_one"}]
      |  }
      | }
      |}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dischema_e2e" -> ((s, dir) => {
      val parsed = Dischema.parseString(dischemaJson, _ => ruleStoreJson)
      val spec = parsed.entities.find(_.name == "customer").get

      // contract stage: stringified + indexed -> validate + cast
      val raw = Readers.addRecordIndex(
        Contract.stringify(s.read.parquet(s"$dir/customer.parquet")
          .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")))
      val (typed, contractMessages) = Contract(raw, spec)

      // refdata resolved relative to the data dir (filename source kind)
      val refdata = parsed.referenceData.map { case (name, src) =>
        name -> s.read.parquet(s"$dir/${src.location}")
      }
      val catalog = EntityCatalog(Map("customer" -> typed), refdata = refdata)

      // business rules: complex rules then root rule (reference order)
      parsed.rules.foreach { r =>
        SyncFilters.applyRules(catalog, r.preSync, r.filters, r.postSync)
      }

      // post-rules contract record rejection (ref: pipeline.py:614-625)
      val rejected = Contract.filterContractErrors(catalog("customer"), contractMessages)
      rejected.select("c_custkey", "c_name", "nation_name", "bal_band")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_dischema_e2e" ->
      ("SELECT c_custkey, c_name, n.n_name AS nation_name, " +
        "CASE WHEN c_acctbal > 5000 THEN 'high' ELSE 'low' END AS bal_band " +
        "FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "WHERE c.c_acctbal >= 0 AND c.c_acctbal <= 9000 AND c.c_acctbal > 1000")
  )
}
