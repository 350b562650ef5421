package graft.config

import org.scalatest.funsuite.AnyFunSuite
import graft.config.Step._

class DischemaSpec extends AnyFunSuite {

  private val doc =
    """{
      | "contract": {
      |  "types": {
      |   "Name": {"callable": "constr", "constraints": {"max_length": 30, "min_length": 1}},
      |   "Pressure": {"type": "NonNegativeFloat"}
      |  },
      |  "datasets": {
      |   "planets": {
      |    "fields": {
      |     "planet": "Name",
      |     "gravity": "PositiveFloat",
      |     "pressure": {"type": "Pressure"},
      |     "moons": {"type": "NonNegativeInt", "default": "0"},
      |     "tags": {"type": "str", "is_array": true},
      |     "reading": {"callable": "condecimal", "constraints": {"max_digits": 10, "decimal_places": 2}}
      |    },
      |    "key_field": "planet",
      |    "aliases": {"planet": "planet_name"},
      |    "mandatory_fields": ["planet", "gravity"],
      |    "reader_config": {".csv": {"reader": "SparkCSVReader"}}
      |   }
      |  }
      | },
      | "transformations": {
      |  "reference_data": {"sats": {"type": "filename", "filename": "./refdata/sats.parquet"}},
      |  "rule_stores": [{"store_type": "json", "filename": "store.json"}],
      |  "rules": [
      |   {"operation": "left_join", "entity": "planets", "target": "refdata_sats",
      |    "join_condition": "planets.planet = refdata_sats.planet",
      |    "new_columns": {"refdata_sats.gm": "gm"}},
      |   {"operation": "group_by", "entity": "planets", "group_by": {"planet": "planet"},
      |    "agg_columns": {"max(gm)": "max_gm"}, "new_entity_name": "biggest"}
      |  ],
      |  "filters": [
      |   {"entity": "planets", "name": "weak", "expression": "gravity < 25",
      |    "error_code": "WEAK", "failure_message": "too weak", "reporting_field": "gravity"},
      |   {"rule_name": "field_over_1000", "parameters": {"entity": "planets", "field": "density"},
      |    "error_code": "DENSITY_OVER_1000"}
      |  ],
      |  "complex_rules": [{"rule_name": "add_and_remove", "parameters": {"entity": "planets"}}]
      | }
      |}""".stripMargin

  private val store =
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
      |   "rules": [{"operation": "add", "entity": "{{entity}}", "column_name": "one", "expression": "1"}],
      |   "filters": [{"entity": "{{entity}}", "expression": "one = 1"}],
      |   "post_filter_rules": [{"operation": "remove", "entity": "{{entity}}", "column_name": "one"}]
      |  }
      | }
      |}""".stripMargin

  private def parsed = Dischema.parseString(doc, _ => store)

  test("contract datasets resolve named types, callables, arrays, defaults, mandatory") {
    val e = parsed.entities.head
    assert(e.name == "planets" && e.keyField.contains("planet"))
    assert(e.aliases == Map("planet" -> "planet_name"))
    val byName = e.fields.map(f => f.name -> f).toMap
    assert(byName("planet").typeName == "str" && byName("planet").maxLength.contains(30)
      && byName("planet").mandatory)
    assert(byName("gravity").typeName == "float" && byName("gravity").gt.contains(BigDecimal(0))
      && byName("gravity").mandatory)
    assert(byName("pressure").typeName == "float" && byName("pressure").ge.contains(BigDecimal(0)))
    assert(byName("moons").typeName == "long" && byName("moons").default.contains("0"))
    assert(byName("tags").isArray)
    assert(byName("reading").typeName == "decimal" && byName("reading").precision.contains(10)
      && byName("reading").scale.contains(2))
  }

  test("permissivenhsno keeps its own type name and parses warn_on_test_numbers") {
    val doc =
      """{"contract": {"datasets": {"p": {"fields": {
        | "a": {"callable": "permissivenhsno"},
        | "b": {"callable": "permissivenhsno", "constraints": {"warn_on_test_numbers": true}},
        | "c": {"callable": "nhsnumber"}
        |}}}}}""".stripMargin
    val fields = Dischema.parseString(doc).entities.head.fields.map(f => f.name -> f).toMap
    assert(fields("a").typeName == "permissivenhsno" && fields("a").warnOnTestNumbers.isEmpty)
    assert(fields("b").typeName == "permissivenhsno" && fields("b").warnOnTestNumbers.contains(true))
    assert(fields("c").typeName == "nhsnumber")
  }

  test("reader config and reference data are exposed") {
    assert(parsed.readerByEntity("planets") == Map(".csv" -> "SparkCSVReader"))
    assert(parsed.referenceData("sats") == Dischema.RefDataSource("filename", "./refdata/sats.parquet"))
  }

  test("root rule steps parse with the operation discriminator") {
    val root = parsed.rootRule
    assert(root.preSync == Seq(
      LeftJoin("planets", "refdata_sats", "planets.planet = refdata_sats.planet",
        MultiExpr.Aliased(Seq("refdata_sats.gm" -> "gm"))),
      GroupBy("planets", MultiExpr.Aliased(Seq("planet" -> "planet")),
        MultiExpr.Aliased(Seq("max(gm)" -> "max_gm")), None, None, Some("biggest"))))
  }

  test("concrete and rule-store filters parse; store templates resolve jinja subset") {
    val fs = parsed.rootRule.filters
    assert(fs.head == DeferredFilter("planets", "gravity < 25",
      Reporting("WEAK", "too weak", category = Some("Bad value"),
        reportingField = Some("gravity"))))
    val store = fs(1)
    assert(store.expression == "density IS NOT NULL AND density > 1000")
    // the outer error_code on a rule_name filter is DROPPED (reference
    // parity: BusinessFilterConfig carries only rule_name + parameters, so
    // planets.feature gets HIGH_DENSITY despite writing DENSITY_OVER_1000)
    assert(store.reporting.code == "HIGH_DENSITY")
    assert(store.reporting.message == "Field is low") // or-default literal
    assert(store.reporting.reportingField.contains("'density'")) // repr()
  }

  test("complex rules run before the root rule with parameters substituted") {
    val cr = parsed.rules.head
    assert(cr.name == "add_and_remove")
    assert(cr.preSync == Seq(Add("planets", "one", "1")))
    assert(cr.filters.map(_.expression) == Seq("one = 1"))
    assert(cr.postSync == Seq(Remove("planets", "one")))
    assert(parsed.rules.last.name == "root")
  }

  test("global params template rules upfront; per-record placeholders survive") {
    val s = """{"transformations": {
      "rules": [{"operation": "filter_without_notifying", "entity": "planets",
                 "filter_rule": "gravity > {{min_gravity}}"}],
      "filters": [{"entity": "planets", "expression": "n_moons < {{max_moons}}",
                   "error_code": "MOONS",
                   "failure_message": "{{name}} has too many moons ({{max_moons}} max)"}]}}"""
    val p = Dischema.parseString(s, globalParams = Map("min_gravity" -> 2, "max_moons" -> 100))
    assert(p.rootRule.preSync == Seq(Filter("planets", "gravity > 2")))
    val f = p.rootRule.filters.head
    assert(f.expression == "n_moons < 100")
    // {{name}} is a record field, not a global — it must survive for
    // per-record message templating at notify time
    assert(f.reporting.message == "{{name}} has too many moons (100 max)")
  }

  test("runtime templating strategy re-renders store rules at evaluation time") {
    val s = """{"transformations": {
      "templating_strategy": "runtime",
      "rule_stores": [{"store_type": "json", "filename": "store.json"}],
      "filters": [{"rule_name": "field_over_1000",
                   "parameters": {"entity": "planets", "field": "{{runtime_field}}"}}]}}"""
    val p = Dischema.parseString(s, _ => store)
    assert(p.templatingStrategy == "runtime")
    // parse-time render leaves the runtime variable as a live placeholder
    assert(p.rules.last.filters.head.expression.contains("{{runtime_field}}"))
    // evaluation-time render resolves it (and the derived default code)
    val rendered = p.rulesWith(Map("runtime_field" -> "density")).last.filters.head
    assert(rendered.expression == "density IS NOT NULL AND density > 1000")
    assert(rendered.reporting.code == "HIGH_DENSITY")
    // upfront configs are untouched by the new machinery
    assert(parsed.templatingStrategy == "upfront")
    assert(parsed.rulesWith(Map.empty) == parsed.rules)
  }

  test("remove_entities accepts string or array entity") {
    val s = """{"transformations": {"rules": [
      {"operation": "remove_entities", "entity": ["a", "b"]},
      {"operation": "remove_entity", "entity": "c"}]}}"""
    val p = Dischema.parseString(s)
    assert(p.rootRule.preSync == Seq(RemoveEntities(Seq("a", "b")), RemoveEntity("c")))
  }
}
