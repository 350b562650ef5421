package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.contract.{EntitySpec, FieldFunction, FieldSpec}
import graft.templating.Templating
import scala.jdk.CollectionConverters._

/** JSON "dischema" configuration parser — the user-facing entry point of the
  * engine: a JSON document declaring the data contract (types, datasets,
  * fields, readers) and the business transformations (rules, filters, rule
  * stores, complex rules, reference data).
  *
  * Mirrors the reference's configuration language
  * (ref: configuration/v1/__init__.py:169-306, steps.py:346-365 discriminated
  * on `operation`, filters.py:12-63, metadata_parser/models.py:96-412) using
  * Jackson (ships with Spark). Rule-store rules are templated with their
  * parameters at load time (upfront strategy).
  */
object Dischema {

  final case class RefDataSource(kind: String, location: String) // filename | uri | table

  /** One rule = pre-sync steps, sync filters, post-sync steps
    * (ref: backends/metadata/rules.py Rule).
    */
  final case class Rule(name: String, preSync: Seq[Step], filters: Seq[DeferredFilter],
                        postSync: Seq[Step])

  final case class Parsed(
      entities: Seq[EntitySpec],
      mandatoryByEntity: Map[String, Seq[String]],
      readerByEntity: Map[String, Map[String, String]], // entity -> extension -> reader
      /** entity -> extension -> reader kwargs (record_tag,
        * n_records_to_read, xsd_location, ... — ref: _ReaderConfig.kwargs_).
        */
      readerKwargs: Map[String, Map[String, Map[String, String]]] = Map.empty,
      /** Document-level template parameters (transformations.parameters) —
        * also names the MAIN entity for submission statistics (ref:
        * pipeline.py:639-643 global_variables.get('entity', dataset_id)).
        */
      parameters: Map[String, String] = Map.empty,
      /** Directory of the dischema document; reader-kwarg paths (an
        * xsd_location) resolve against it, like the reference's injected
        * rules_location (ref: configuration/v1/__init__.py:200-210).
        */
      baseDir: String = ".",
      referenceData: Map[String, RefDataSource],
      rules: Seq[Rule], // complex rules first, then the root rule (reference order)
      /** `upfront` (default): rules templated once at parse;
        * `runtime`: rule-store configs re-templated at evaluation time so
        * variables resolved from runtime context participate
        * (ref: backends/metadata/rules.py:690-704).
        */
      templatingStrategy: String = "upfront",
      /** Re-render the rules with extra (runtime) template variables; the
        * identity of [[rules]] when none are given. Defaults to returning
        * [[rules]] unchanged so directly-constructed configs (tests,
        * programmatic use) are safe under `templatingStrategy = "runtime"`.
        */
      rulesWith: Map[String, Any] => Seq[Rule] = null
  ) {
    /** Never-null accessor for [[rulesWith]]. */
    def renderRules(params: Map[String, Any]): Seq[Rule] =
      Option(rulesWith).map(_(params)).getOrElse(rules)

    /** All steps/filters flattened in execution order. */
    def rootRule: Rule = rules.last
  }

  private val mapper = new ObjectMapper()

  /** `globalParams` template the transformation configs upfront (lenient —
    * unresolved per-record placeholders survive for message templating),
    * mirroring the reference's global template variables
    * (ref: base/rules.py:572-584, templating strategy "upfront").
    */
  def parseFile(path: String, globalParams: Map[String, Any] = Map.empty): Parsed = {
    val root = mapper.readTree(new java.io.File(path))
    val baseDir = Option(new java.io.File(path).getParent).getOrElse(".")
    parse(root, name => mapper.readTree(new java.io.File(new java.io.File(baseDir, name).getPath)),
      globalParams).copy(baseDir = baseDir)
  }

  def parseString(json: String, ruleStoreLoader: String => String = _ => "{}",
                  globalParams: Map[String, Any] = Map.empty): Parsed = {
    val root = mapper.readTree(json)
    parse(root, name => mapper.readTree(ruleStoreLoader(name)), globalParams)
  }

  // ------------------------------------------------------------------ contract

  /** Pydantic / domain type name -> FieldSpec attributes
    * (ref: metadata_parser/model_generator.py:63-80, spark_helpers.py:91-100).
    */
  private def baseFieldSpec(name: String, typeName: String): FieldSpec = typeName match {
    case "str" | "string"         => FieldSpec(name, "str")
    case "int" | "long"           => FieldSpec(name, "long")
    case "float" | "double"       => FieldSpec(name, "float")
    case "bool" | "boolean"       => FieldSpec(name, "bool")
    case "date"                   => FieldSpec(name, "date")
    case "datetime"               => FieldSpec(name, "datetime")
    case "time"                   => FieldSpec(name, "time")
    case "Decimal" | "decimal"    => FieldSpec(name, "decimal")
    case "PositiveFloat"          => FieldSpec(name, "float", gt = Some(BigDecimal(0)))
    case "NonNegativeFloat"       => FieldSpec(name, "float", ge = Some(BigDecimal(0)))
    case "NegativeFloat"          => FieldSpec(name, "float", lt = Some(BigDecimal(0)))
    case "PositiveInt"            => FieldSpec(name, "long", gt = Some(BigDecimal(0)))
    case "NonNegativeInt"         => FieldSpec(name, "long", ge = Some(BigDecimal(0)))
    case "NegativeInt"            => FieldSpec(name, "long", lt = Some(BigDecimal(0)))
    case other                    => FieldSpec(name, other) // domain types: nhsnumber, postcode, ...
  }

  /** Constrained-type factory (`callable` + `constraints`)
    * (ref: model_generator.py:63-80).
    */
  private def callableFieldSpec(name: String, callableName: String, c: JsonNode): FieldSpec = {
    def str(k: String): Option[String] = Option(c.get(k)).map(_.asText)
    def int(k: String): Option[Int] = Option(c.get(k)).map(_.asInt)
    def dec(k: String): Option[BigDecimal] = Option(c.get(k)).map(n => BigDecimal(n.asText))
    val base = callableName match {
      case "constr"        => FieldSpec(name, "str", minLength = int("min_length"),
        maxLength = int("max_length"), regex = str("regex"))
      case "conint"        => FieldSpec(name, "long")
      case "confloat"      => FieldSpec(name, "float")
      case "condecimal"    => FieldSpec(name, "decimal",
        precision = int("max_digits"), scale = int("decimal_places"))
      case "condate"       => FieldSpec(name, "date")
      // the reference's constraint key is date_format (nested_books'
      // non_iso_date); plain `format` accepted as the legacy spelling
      case "conformatteddate" => FieldSpec(name, "date",
        format = str("date_format").orElse(str("format")))
      case "formatteddatetime" => FieldSpec(name, "formatteddatetime", format = str("format"),
        timezoneTreatment = str("timezone_treatment"))
      case "formattedtime" => FieldSpec(name, "time", format = str("format"))
      case "postcode" | "nhsnumber" | "orgid" =>
        FieldSpec(name, callableName)
      // checksum enforced like nhsnumber, but test-number warnings are OFF
      // unless warn_on_test_numbers asks for them (ref:
      // domain_types.py:166-174 — the permissive factory defaults the
      // class flag to False; the r8 alias onto nhsnumber wrongly inherited
      // the always-warn lane)
      case "permissivenhsno" =>
        FieldSpec(name, "permissivenhsno",
          warnOnTestNumbers = Option(c.get("warn_on_test_numbers")).map(_.asBoolean))
      case "alphanumeric"  => FieldSpec(name, "alphanumeric", maxLength = int("max_length"))
      case "identifier"    => FieldSpec(name, "identifier", maxLength = int("max_length"))
      case "reportingperiodstart" => FieldSpec(name, "reportingperiodstart")
      case "reportingperiodend"   => FieldSpec(name, "reportingperiodend")
      case other           => FieldSpec(name, other)
    }
    base.copy(ge = base.ge.orElse(dec("ge")), le = base.le.orElse(dec("le")),
      gt = base.gt.orElse(dec("gt")), lt = base.lt.orElse(dec("lt")))
  }

  private def parseFunctions(node: JsonNode): Seq[FieldFunction] =
    Option(node.get("functions")).toSeq.flatMap(_.elements().asScala).map { fn =>
      if (fn.isTextual) FieldFunction(fn.asText)
      else FieldFunction(
        fn.get("name").asText,
        Option(fn.get("error_type")).map(_.asText).getOrElse("record_rejection"),
        Option(fn.get("kwargs")).map(kw =>
          kw.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap).getOrElse(Map.empty))
    }

  /** Resolve one field spec; `types` = contract-level named types,
    * `datasets` = schemas for the nested `model` form.
    */
  private def parseField(name: String, node: JsonNode, types: Map[String, JsonNode],
                         datasets: JsonNode): FieldSpec = {
    if (node.isTextual) return resolveTypeName(name, node.asText, types, datasets)
    val isArray = Option(node.get("is_array")).exists(_.asBoolean)
    val default = Option(node.get("default")).filterNot(_.isNull).map(_.asText)
    val fns = parseFunctions(node)
    val base =
      if (node.has("type")) resolveTypeName(name, node.get("type").asText, types, datasets)
      else if (node.has("callable"))
        callableFieldSpec(name, node.get("callable").asText,
          Option(node.get("constraints")).getOrElse(mapper.createObjectNode()))
      else if (node.has("model")) {
        val modelName = node.get("model").asText
        val modelNode = Option(datasets.get(modelName)).getOrElse(
          throw new IllegalArgumentException(s"model '$modelName' not found in datasets"))
        FieldSpec(name, "struct", fields = parseEntityFields(modelNode, types, datasets))
      } else throw new IllegalArgumentException(
        s"field '$name' must declare one of type/callable/model")
    base.copy(isArray = isArray, default = default, functions = fns)
  }

  private def resolveTypeName(name: String, typeName: String, types: Map[String, JsonNode],
                              datasets: JsonNode): FieldSpec =
    types.get(typeName) match {
      case Some(t) => parseField(name, t, types - typeName, datasets)
      case None    => baseFieldSpec(name, typeName)
    }

  private def parseEntityFields(entityNode: JsonNode, types: Map[String, JsonNode],
                                datasets: JsonNode): Seq[FieldSpec] = {
    val mandatory = Option(entityNode.get("mandatory_fields")).toSeq
      .flatMap(_.elements().asScala).map(_.asText).toSet
    Option(entityNode.get("fields")).toSeq.flatMap(_.properties().asScala).map { e =>
      parseField(e.getKey, e.getValue, types, datasets)
        .copy(mandatory = mandatory.contains(e.getKey))
    }
  }

  // ------------------------------------------------------------------ steps

  private def multiExpr(node: JsonNode): MultiExpr = node match {
    case null            => MultiExpr.empty
    case o: ObjectNode if o.properties().asScala.exists(_.getValue.isArray) =>
      // an array-valued alias fans one generator expression into several
      // output columns (the reference's multialias select)
      MultiExpr.MultiAliased(o.properties().asScala.map { e =>
        e.getKey -> (if (e.getValue.isArray)
          e.getValue.elements().asScala.map(_.asText).toSeq
        else Seq(e.getValue.asText))
      }.toSeq)
    case o: ObjectNode   =>
      MultiExpr.Aliased(o.properties().asScala.map(e => e.getKey -> e.getValue.asText).toSeq)
    case a: ArrayNode    => MultiExpr.Exprs(a.elements().asScala.map(_.asText).toSeq)
    case t if t.isTextual => MultiExpr.Raw(t.asText)
    case other           => throw new IllegalArgumentException(s"bad expression form: $other")
  }

  private def opt(node: JsonNode, k: String): Option[String] =
    Option(node.get(k)).filterNot(_.isNull).map(_.asText)

  private def boolOr(node: JsonNode, k: String, dflt: Boolean): Boolean =
    Option(node.get(k)).map(_.asBoolean).getOrElse(dflt)

  /** One step config object -> Step ADT, discriminated on `operation`
    * (ref: configuration/v1/steps.py:346-365).
    */
  def parseStep(node: JsonNode): Step = {
    val entity = opt(node, "entity").getOrElse("")
    val newName = opt(node, "new_entity_name")
    node.get("operation").asText match {
      case "add" => Step.Add(entity, node.get("column_name").asText,
        node.get("expression").asText, newName)
      case "remove" => Step.Remove(entity, node.get("column_name").asText, newName)
      case "select" => Step.Select(entity, multiExpr(node.get("columns")),
        boolOr(node, "distinct", dflt = false), newName)
      case "group_by" => Step.GroupBy(entity, multiExpr(node.get("group_by")),
        multiExpr(node.get("agg_columns")), opt(node, "pivot_column"),
        Option(node.get("pivot_values")).map(_.elements().asScala.map(_.asText: Any).toSeq),
        newName)
      case "filter_without_notifying" =>
        Step.Filter(entity, node.get("filter_rule").asText, newName)
      case "left_join" => Step.LeftJoin(entity, node.get("target").asText,
        node.get("join_condition").asText, multiExpr(node.get("new_columns")), newName)
      case "inner_join" => Step.InnerJoin(entity, node.get("target").asText,
        node.get("join_condition").asText, multiExpr(node.get("new_columns")), newName)
      case "join" | "one_to_one_join" => Step.OneToOneJoin(entity, node.get("target").asText,
        node.get("join_condition").asText, multiExpr(node.get("new_columns")),
        boolOr(node, "perform_integrity_check", dflt = true), newName)
      case "semi_join" => Step.SemiJoin(entity, node.get("target").asText,
        node.get("join_condition").asText, newName)
      case "anti_join" => Step.AntiJoin(entity, node.get("target").asText,
        node.get("join_condition").asText, newName)
      case "has_match" => Step.HasMatch(entity, node.get("target").asText,
        node.get("join_condition").asText, node.get("column_name").asText,
        boolOr(node, "perform_integrity_check", dflt = true), newName)
      case "join_header" => Step.JoinHeader(entity, node.get("target").asText,
        opt(node, "header_column_name").getOrElse("_Header"), newName)
      case "union" => Step.Union(entity, node.get("target").asText, newName)
      case "copy_entity" => Step.CopyEntity(entity, node.get("new_entity_name").asText)
      case "rename_entity" => Step.RenameEntity(entity, node.get("new_entity_name").asText)
      case "remove_entity" | "remove_entities" =>
        val e = node.get("entity")
        if (e.isArray) Step.RemoveEntities(e.elements().asScala.map(_.asText).toSeq)
        else Step.RemoveEntity(e.asText)
      case other => throw new IllegalArgumentException(s"unknown operation: '$other'")
    }
  }

  /** Concrete filter config -> DeferredFilter
    * (ref: configuration/v1/filters.py:12-49).
    */
  def parseFilter(node: JsonNode): DeferredFilter = {
    val informational = Option(node.get("is_informational")).exists {
      case b if b.isBoolean => b.asBoolean
      case s                => s.asText.equalsIgnoreCase("true")
    }
    val failureType = opt(node, "failure_type").getOrElse("record")
    val emit =
      if (informational) "warning"
      else if (failureType == "submission") "submission_failure"
      else "record_failure"
    DeferredFilter(
      node.get("entity").asText,
      node.get("expression").asText,
      Reporting(
        code = opt(node, "error_code").getOrElse(""),
        message = opt(node, "failure_message").getOrElse(""),
        emit = emit,
        category = opt(node, "category").orElse(Some("Bad value")), // ref default

        reportingField = opt(node, "reporting_field"),
        errorLocation = opt(node, "error_location"),
        reportingEntityOverride = opt(node, "reporting_entity")))
  }

  // ------------------------------------------------------------------ whole document

  private def parse(root: JsonNode, loadStore: String => JsonNode,
                    globalParams: Map[String, Any] = Map.empty): Parsed = {
    val contract = Option(root.get("contract")).getOrElse(mapper.createObjectNode())
    val types = Option(contract.get("types")).map(t =>
      t.properties().asScala.map(e => e.getKey -> e.getValue).toMap).getOrElse(Map.empty)
    val datasets = Option(contract.get("datasets")).getOrElse(mapper.createObjectNode())
    // `model` references resolve against component schemas AND datasets —
    // the reference declares nested models under contract.schemas (ref:
    // configuration/v1/__init__.py V1DataContractConfig.schemas; movies'
    // cast model), while self-referencing datasets also work
    val modelNodes: ObjectNode = {
      val merged = mapper.createObjectNode()
      Option(contract.get("schemas")).foreach(s =>
        s.properties().asScala.foreach(e => merged.set[JsonNode](e.getKey, e.getValue)))
      datasets.properties().asScala.foreach(e => merged.set[JsonNode](e.getKey, e.getValue))
      merged
    }

    // per-(field, category) error-detail overrides: inline object, or a
    // filename resolved by the same loader as rule stores
    // (ref: configuration/v1/__init__.py:316-339 load_error_message_info)
    val errorDetails: Map[String, Map[String, graft.contract.ErrorDetail]] =
      Option(contract.get("error_details")).map { n =>
        val node = if (n.isTextual) loadStore(n.asText) else n
        node.properties().asScala.map { f =>
          f.getKey -> f.getValue.properties().asScala.map { c =>
            val d = c.getValue
            c.getKey -> graft.contract.ErrorDetail(
              errorCode = d.get("error_code").asText,
              errorLevel = opt(d, "error_level").getOrElse("record"),
              isInformational = boolOr(d, "is_informational", dflt = false),
              errorMessage = opt(d, "error_message"),
              reportingEntity = opt(d, "reporting_entity"))
          }.toMap
        }.toMap
      }.getOrElse(Map.empty)

    val entities = datasets.properties().asScala.toSeq.map { e =>
      val aliases = Option(e.getValue.get("aliases")).map(a =>
        a.properties().asScala.map(p => p.getKey -> p.getValue.asText).toMap).getOrElse(Map.empty)
      EntitySpec(e.getKey, parseEntityFields(e.getValue, types, modelNodes),
        aliases = aliases, keyField = opt(e.getValue, "key_field"),
        errorDetails = errorDetails)
    }
    val mandatoryByEntity = datasets.properties().asScala.map { e =>
      e.getKey -> Option(e.getValue.get("mandatory_fields")).toSeq
        .flatMap(_.elements().asScala).map(_.asText)
    }.toMap
    val readerByEntity = datasets.properties().asScala.map { e =>
      e.getKey -> Option(e.getValue.get("reader_config")).map(rc =>
        rc.properties().asScala.map(p =>
          p.getKey -> Option(p.getValue.get("reader")).map(_.asText).getOrElse("")).toMap)
        .getOrElse(Map.empty[String, String])
    }.toMap
    val readerKwargs = datasets.properties().asScala.map { e =>
      e.getKey -> Option(e.getValue.get("reader_config")).map(rc =>
        rc.properties().asScala.map(p =>
          p.getKey -> Option(p.getValue.get("kwargs")).map(kw =>
            kw.properties().asScala.map(k => k.getKey -> k.getValue.asText).toMap)
            .getOrElse(Map.empty[String, String])).toMap)
        .getOrElse(Map.empty[String, Map[String, String]])
    }.toMap

    val tf = Option(root.get("transformations")).getOrElse(mapper.createObjectNode())
    val refdata = Option(tf.get("reference_data")).map(rd =>
      rd.properties().asScala.map { e =>
        val kind = opt(e.getValue, "type").getOrElse("filename")
        val loc = kind match {
          // database + table_name -> a qualified catalog table (ref:
          // reference_data.py ReferenceTable; movies.dischema.json uses
          // {"type": "table", "database": "movies_refdata", "table_name": "sequels"})
          case "table" =>
            val t = opt(e.getValue, "table_name").orElse(opt(e.getValue, "table")).getOrElse("")
            opt(e.getValue, "database").map(db => s"$db.$t").getOrElse(t)
          case _ => opt(e.getValue, "filename").orElse(opt(e.getValue, "uri"))
            .orElse(opt(e.getValue, "table")).getOrElse("")
        }
        e.getKey -> RefDataSource(kind, loc)
      }.toMap).getOrElse(Map.empty)

    // document-level template parameters (ref: configuration/v1/__init__.py
    // V1TransformationConfig.parameters — movies' {"entity": "movies"} feeds
    // every stored rule that omits an explicit entity parameter); explicit
    // caller globals win on key collisions
    val docParams: Map[String, Any] = Option(tf.get("parameters")).map(p =>
      p.properties().asScala.map(e => e.getKey -> (e.getValue.asText: Any)).toMap)
      .getOrElse(Map.empty)
    val allGlobals = docParams ++ globalParams

    // rule stores: name -> spec ({type: filter|complex_rule, rule_config, parameter_defaults})
    val storeRules: Map[String, JsonNode] =
      Option(tf.get("rule_stores")).toSeq.flatMap(_.elements().asScala).flatMap { sc =>
        val loaded = loadStore(Option(sc.get("filename")).map(_.asText).getOrElse(""))
        loaded.properties().asScala.map(e => e.getKey -> e.getValue)
      }.toMap

    // Rule construction is a function of the runtime template variables so
    // the `runtime` strategy can re-render stored rule configs at evaluation
    // time (ref: base/rules.py:570-596 — upfront templates once, runtime
    // templates immediately before evaluating). Upfront parses once below.
    def buildRules(runtimeVars: Map[String, Any]): Seq[Rule] = {

    def renderNode(node: JsonNode, params: Map[String, Any]): JsonNode = {
      // lenient: unresolved (per-record) placeholders survive to notify time
      val rendered = Templating.renderLenient(mapper.writeValueAsString(node),
        allGlobals ++ runtimeVars ++ params)
      mapper.readTree(rendered)
    }

    def parseFilterList(node: JsonNode, extraParams: Map[String, Any]): Seq[DeferredFilter] =
      Option(node).toSeq.flatMap(_.elements().asScala).map { f0 =>
        val f = if (allGlobals.nonEmpty || runtimeVars.nonEmpty) renderNode(f0, extraParams) else f0
        if (f.has("rule_name")) { // business filter from a rule store
          val spec = storeRules.getOrElse(f.get("rule_name").asText,
            throw new IllegalArgumentException(s"rule '${f.get("rule_name").asText}' not in any rule store"))
          // ONLY parameter_defaults + parameters template the stored rule:
          // the reference's BusinessFilterConfig model carries nothing else,
          // so outer keys like error_code/reporting_field on a rule_name
          // filter are silently DROPPED (ref: configuration/v1/filters.py:
          // 52-58, pydantic ignores extra fields) — planets.feature asserts
          // HIGH_DENSITY, the template default, even though the dischema
          // writes error_code DENSITY_OVER_1000 at the filter level
          val params = extraParams ++
            Option(spec.get("parameter_defaults")).map(p =>
              p.properties().asScala.map(e => e.getKey -> (e.getValue.asText: Any)).toMap).getOrElse(Map.empty) ++
            Option(f.get("parameters")).map(p =>
              p.properties().asScala.map(e => e.getKey -> (e.getValue.asText: Any)).toMap).getOrElse(Map.empty)
          parseFilter(renderNode(spec.get("rule_config"), params))
        } else parseFilter(f)
      }

    def parseStepList(node: JsonNode): Seq[Step] =
      Option(node).toSeq.flatMap(_.elements().asScala)
        .map(n => parseStep(
          if (allGlobals.nonEmpty || runtimeVars.nonEmpty) renderNode(n, Map.empty) else n))

    // complex rules (from stores) first, then the root rule — reference order
    // (ref: configuration/v1/__init__.py:281-306 _load_rules_and_vars)
    val complexRules = Option(tf.get("complex_rules")).toSeq.flatMap(_.elements().asScala).map { cr =>
      val name = cr.get("rule_name").asText
      val spec = storeRules.getOrElse(name,
        throw new IllegalArgumentException(s"complex rule '$name' not in any rule store"))
      val params =
        Option(spec.get("parameter_defaults")).map(p =>
          p.properties().asScala.map(e => e.getKey -> (e.getValue.asText: Any)).toMap).getOrElse(Map.empty) ++
        Option(cr.get("parameters")).map(p =>
          p.properties().asScala.map(e => e.getKey -> (e.getValue.asText: Any)).toMap).getOrElse(Map.empty)
      val rc = renderNode(spec.get("rule_config"), params)
      Rule(name,
        parseStepList(rc.get("rules")),
        parseFilterList(rc.get("filters"), params),
        parseStepList(rc.get("post_filter_rules")))
    }

    val rootRule = Rule("root",
      parseStepList(tf.get("rules")),
      parseFilterList(tf.get("filters"), Map.empty),
      parseStepList(tf.get("post_filter_rules")))

    complexRules :+ rootRule
    } // end buildRules

    val strategy = opt(tf, "templating_strategy").getOrElse("upfront")
    val eagerRules = buildRules(Map.empty)
    Parsed(entities, mandatoryByEntity, readerByEntity,
      readerKwargs = readerKwargs,
      parameters = docParams.map { case (k, v) => k -> v.toString },
      referenceData = refdata, rules = eagerRules,
      templatingStrategy = strategy,
      rulesWith = vars => if (vars.isEmpty) eagerRules else buildRules(vars))
  }
}
