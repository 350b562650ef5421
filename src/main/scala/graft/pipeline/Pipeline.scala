package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.audit.AuditManager
import graft.config.Dischema
import graft.contract.Contract
import graft.readers.Readers
import graft.refdata.RefDataLoader
import graft.report.ErrorSink
import graft.rules.{EntityCatalog, SyncFilters}

/** The four pipeline services over a working directory with parquet stage
  * checkpoints (ref: pipeline/pipeline.py:950-977 cluster run;
  * :198-246 transform, :426-477 data_contract, :546-653 business_rules,
  * :801-875 error_report):
  *
  *   transform/<entity>      stringified rows + __record_index__
  *   data_contract/<entity>  typed rows (record index kept)
  *   business_rules/<entity> post-rules rows, contract rejections removed
  *   errors/<stage>_errors.jsonl, error_reports/{aggregate,detail}
  *
  * Stage boundaries are parquet on purpose — restartability is a feature the
  * reference relies on, and each stage's output is read exactly once by the
  * next. Audit status transitions mirror the reference's
  * received -> transform -> data_contract -> business_rules -> error_report
  * -> finished.
  */
object Pipeline {

  final case class SubmissionConfig(
      submissionId: String,
      dataFile: String, // submitted data file (or directory)
      dischema: Dischema.Parsed,
      workingDir: String,
      refdataBaseDir: String = ".",
      auditDir: Option[String] = None,
      csvOptions: Readers.CsvOptions = Readers.CsvOptions(),
      xmlRowTags: Map[String, String] = Map.empty, // entity -> rowTag
      /** Evaluation-time template variables for the `runtime` templating
        * strategy (ref: backends/metadata/rules.py:690-704) — e.g. values
        * resolved from the submission's metadata or data.
        */
      runtimeParams: Map[String, Any] = Map.empty,
      /** Concurrent per-entity stage work within ONE submission. The
        * per-entity checkpoint layout costs a fixed number of Spark jobs
        * per entity; on a many-small-entities dischema (~100 tiny
        * entities) that fixed cost IS the wall clock (EntityProbe measured
        * ~0.8 s/entity sequential), and the jobs are independent per
        * entity (each writes its own transform/data_contract/
        * business_rules/<entity> dir), so they pipeline across the
        * executor like any other independent job set. Rules stay
        * sequential (cross-entity semantics); shared JSONL appends are
        * serialized internally. 1 = the old sequential loop.
        */
      entityParallelism: Int = 8,
      /** Operational bound on ONE parallel entity-stage fan-out: a hung
        * entity job (stuck storage RPC, deadlocked source) fails the
        * submission after this many seconds instead of blocking forever on
        * an unbounded Await. Generous by default — a stage legitimately
        * takes minutes at scale; this is a circuit breaker, not a budget.
        */
      entityStageTimeoutSec: Long = 4 * 3600,
      /** Opt-in many-small-entities layout: each stage checkpoints ONE
        * entity-partitioned parquet table ([[StageIO]]) instead of one
        * directory per entity, collapsing the N per-entity write jobs into
        * one union write — the per-entity job overhead (EntityProbe:
        * ~0.28 s/entity even at parallelism 8) stops scaling with the
        * entity count. The per-entity-dir layout stays the default: it is
        * the reference's on-disk contract and the right shape for bulk
        * data, where the single-table payload codec would cost per row.
        */
      singleTableLayout: Boolean = false)

  final case class PipelineResult(
      validationFailed: Boolean,
      recordCounts: Map[String, Long],
      finalStatus: String)

  private def fileExtension(path: String): String = {
    val i = path.lastIndexOf('.')
    if (i < 0) "" else path.substring(i).toLowerCase
  }

  /** Run `f` over the entities with bounded concurrency, preserving result
    * order. Fail-fast like the sequential loop: the first entity failure
    * aborts the submission (remaining in-flight futures finish but their
    * results are discarded with the pool).
    */
  private def parEntities[A, B](items: Seq[A], parallelism: Int,
                                timeoutSec: Long = Long.MaxValue)(f: A => B): Seq[B] =
    if (parallelism <= 1 || items.size <= 1) items.map(f)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      // Daemon threads: a timed-out (abandoned) entity job must not pin the
      // JVM open after the submission has already failed and moved on.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, items.size),
        (r: Runnable) => {
          val t = new Thread(r, "graft-entity-stage")
          t.setDaemon(true); t
        })
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val timeout =
        if (timeoutSec >= Long.MaxValue / 1000) Duration.Inf else timeoutSec.seconds
      try Await.result(Future.sequence(items.map(i => Future(f(i)))), timeout)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          throw new RuntimeException(
            s"entity-stage fan-out exceeded ${timeoutSec}s " +
              s"(entityStageTimeoutSec) — a per-entity job is hung; submission aborted")
      }
      finally pool.shutdown()
    }

  /** Stage 1: read the submitted file per entity with its configured reader
    * and checkpoint stringified + indexed rows.
    */
  def fileTransformation(spark: SparkSession, cfg: SubmissionConfig): Unit = {
    val ext = fileExtension(cfg.dataFile)
    // Configured XSD gates run ONCE per distinct schema, BEFORE any entity
    // parses (ref: readers/xml.py xsd_location kwargs): a structural
    // failure must abort the whole transform phase — validating inside the
    // per-entity loop would re-parse the file per entity and let earlier
    // entities checkpoint before the gate fires. The configured error code
    // leads the exception message so the processing-error record carries it.
    cfg.dischema.entities
      .flatMap(spec => cfg.dischema.readerKwargs
        .getOrElse(spec.name, Map.empty).getOrElse(ext, Map.empty).get("xsd_location")
        .map(_ -> cfg.dischema.readerKwargs(spec.name)(ext)))
      .distinctBy(_._1)
      .foreach { case (xsd, kw) =>
        val xsdPath = if (xsd.startsWith("/")) xsd else s"${cfg.dischema.baseDir}/$xsd"
        val problems = graft.readers.XmlLinting.validate(
          cfg.dataFile.stripPrefix("file:"), xsdPath)
        if (problems.nonEmpty)
          throw new graft.rules.ConstraintException(
            s"[${kw.getOrElse("xsd_error_code", "XSDERROR")}] " +
              kw.getOrElse("xsd_error_message", "the xml failed XSD validation") +
              s": ${problems.head}",
            kw.getOrElse("xsd_error_code", "XSDERROR"))
      }
    def ingest(spec: graft.contract.EntitySpec): DataFrame = {
      val readerName = cfg.dischema.readerByEntity
        .getOrElse(spec.name, Map.empty).getOrElse(ext, defaultReader(ext))
      val raw = readerName match {
        case "SparkCSVReader" | "CSVFileReader" =>
          // header-vs-schema enforcement is OPT-IN (ref: readers/csv.py:40
          // `field_check: bool = False`): with it off, a headered file maps
          // POSITIONALLY onto the declared schema and the header row is
          // just skipped — planets.csv.csv's snake_case header validates
          // with 0 rejections exactly because the check never runs
          val kw = cfg.dischema.readerKwargs
            .getOrElse(spec.name, Map.empty).getOrElse(ext, Map.empty)
          if (cfg.csvOptions.header && kw.get("field_check").exists(_.equalsIgnoreCase("true"))) {
            val missing = Readers.checkCsvHeader(spark, cfg.dataFile, spec, cfg.csvOptions.sep)
            if (missing.nonEmpty)
              throw new graft.rules.ConstraintException(
                s"CSV header for '${spec.name}' is missing declared fields: ${missing.mkString(", ")}",
                "file header must contain every declared field")
          }
          Readers.readCsv(spark, cfg.dataFile, spec, cfg.csvOptions)
        case "SparkJSONReader" =>
          Readers.readJson(spark, cfg.dataFile, spec, multiLine = ext == ".json")
        case "SparkXMLReader" | "BasicXMLFileReader" | "XMLStreamReader"
           | "DuckDBXMLStreamReader" =>
          val kw = cfg.dischema.readerKwargs
            .getOrElse(spec.name, Map.empty).getOrElse(ext, Map.empty)
          Readers.readXml(spark, cfg.dataFile, spec,
            rowTag = kw.getOrElse("record_tag",
              cfg.xmlRowTags.getOrElse(spec.name, spec.name)),
            limit = kw.get("n_records_to_read").map(_.toInt))
        case other =>
          throw new IllegalArgumentException(s"unknown reader: '$other' for ${spec.name}")
      }
      Contract.stringify(raw)
    }
    if (cfg.singleTableLayout) {
      // Frame CONSTRUCTION still fans per entity (a CSV/XML/JSON ingest pays
      // its zipWithIndex count pass eagerly at construction), so it keeps
      // the bounded-parallel loop; the N write jobs collapse into one
      // union write.
      val frames = parEntities(cfg.dischema.entities, cfg.entityParallelism,
        cfg.entityStageTimeoutSec)(spec => spec.name -> ingest(spec))
      StageIO.writeEntities(spark, s"${cfg.workingDir}/transform", frames)
    } else
      parEntities(cfg.dischema.entities, cfg.entityParallelism, cfg.entityStageTimeoutSec) { spec =>
        ingest(spec).write.mode("overwrite").parquet(s"${cfg.workingDir}/transform/${spec.name}")
      }
    ()
  }

  private def defaultReader(ext: String): String = ext match {
    case ".csv"            => "SparkCSVReader"
    case ".json" | ".jsonl" => "SparkJSONReader"
    case ".xml"            => "SparkXMLReader"
    case other             => throw new IllegalArgumentException(s"no reader for '$other'")
  }

  /** Stage 2: contract validate + cast; typed parquet + errors JSONL.
    * Returns true when any non-informational message was produced.
    */
  def dataContract(spark: SparkSession, cfg: SubmissionConfig): Boolean = {
    // Typed writes land in per-entity dirs (safe concurrently); the shared
    // per-stage errors JSONL dir is append-committed through one
    // FileOutputCommitter staging area, so that append alone is serialized
    // under the submission's lock — the messages are materialized (persist +
    // count) BEFORE taking it, so the expensive compute still overlaps.
    val appendLock = new Object
    if (cfg.singleTableLayout) {
      def sub[T](name: String)(f: => T): T =
        if (sys.props.get("graft.pipeline.debug").isEmpty) f
        else {
          val t0 = System.nanoTime(); val r = f
          System.err.println(f"[pipeline]   dc/$name%-14s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
          r
        }
      // One union write for the typed frames, ONE message
      // persist+count+append+flag instead of four jobs per entity.
      val (table, schemas) = StageIO.readTable(spark, s"${cfg.workingDir}/transform")
      val perEntity = sub("plan-build")(cfg.dischema.entities.map { spec =>
        val raw = StageIO.decodeEntity(table, schemas(spec.name), spec.name)
        val (typed, messages) = Contract(raw, spec)
        (spec.name, typed, messages)
      })
      sub("typed-write")(StageIO.writeEntities(spark, s"${cfg.workingDir}/data_contract",
        perEntity.map(e => e._1 -> e._2)))
      val persisted = org.apache.spark.sql.graft.ExpressionBridge
        .flatUnion(perEntity.map(_._3)).persist()
      // materialize + failure flag in ONE aggregation job
      val failed = sub("messages")(
        persisted.agg(count(when(col("Status") =!= "informational", true)))
          .head().getLong(0) > 0)
      sub("msg-append")(ErrorSink.writeFeedbackErrors(persisted, cfg.workingDir, "data_contract"))
      persisted.unpersist()
      failed
    } else {
      val flags = parEntities(cfg.dischema.entities, cfg.entityParallelism, cfg.entityStageTimeoutSec) { spec =>
        val raw = spark.read.parquet(s"${cfg.workingDir}/transform/${spec.name}")
        val (typed, messages) = Contract(raw, spec)
        typed.write.mode("overwrite").parquet(s"${cfg.workingDir}/data_contract/${spec.name}")
        val persisted = messages.persist()
        persisted.count()
        appendLock.synchronized {
          ErrorSink.writeFeedbackErrors(persisted, cfg.workingDir, "data_contract")
        }
        val failed = !persisted.where(col("Status") =!= "informational").isEmpty
        persisted.unpersist()
        failed
      }
      flags.exists(identity)
    }
  }

  /** Stage 3: business rules over the typed entities (+ Original<entity>
    * copies, ref: pipeline.py:581-586), refdata resolved lazily, then
    * post-hoc contract record rejection and checkpoint.
    */
  def businessRules(spark: SparkSession, cfg: SubmissionConfig): Map[String, Long] = {
    // rule-stage functions (over_10, ...) are always in scope for rule and
    // filter expressions, as in the reference's rules engine
    // (ref: spark/rules.py:80-104); registration is idempotent
    graft.functions.GraftFunctions.register(spark)
    // "Original" is a RESERVED prefix: the pre-rules snapshots live at
    // Original<entity> (reference layout, pipeline.py:581-586), so a
    // declared entity named Original* would be silently shadowed by a
    // snapshot and would skip contract rejection — fail fast instead.
    val reserved = cfg.dischema.entities.map(_.name).filter(_.startsWith("Original"))
    require(reserved.isEmpty,
      s"entity name(s) ${reserved.mkString(", ")} use the reserved 'Original' " +
        "prefix (pre-rules snapshot namespace) — rename the entity")
    val dcSingle: Option[(DataFrame, Map[String, org.apache.spark.sql.types.StructType])] =
      if (cfg.singleTableLayout)
        Some(StageIO.readTable(spark, s"${cfg.workingDir}/data_contract"))
      else None
    val typed = dcSingle match {
      case Some((table, schemas)) =>
        cfg.dischema.entities.map(spec =>
          spec.name -> StageIO.decodeEntity(table, schemas(spec.name), spec.name)).toMap
      case None => cfg.dischema.entities.map { spec =>
        spec.name -> spark.read.parquet(s"${cfg.workingDir}/data_contract/${spec.name}")
      }.toMap
    }
    val originals = typed.map { case (n, df) => s"Original$n" -> df }
    val loader = new RefDataLoader(spark, cfg.dischema.referenceData, cfg.refdataBaseDir)
    val catalog = new EntityCatalog(
      typed ++ originals,
      keyFields = cfg.dischema.entities.flatMap(e => e.keyField.map(k => e.name -> Seq(k))).toMap,
      refdataProvider = Some(loader.asProvider))

    // runtime strategy: re-render stored rule configs with the submission's
    // evaluation-time variables; upfront keeps the parse-time rendering
    val rules =
      if (cfg.dischema.templatingStrategy == "runtime")
        cfg.dischema.renderRules(cfg.runtimeParams)
      else cfg.dischema.rules
    def sub[T](name: String)(f: => T): T =
      if (sys.props.get("graft.pipeline.debug").isEmpty) f
      else {
        val t0 = System.nanoTime(); val r = f
        System.err.println(f"[pipeline]   br/$name%-14s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
        r
      }
    val ruleMessages = sub("rules")(rules.flatMap { r =>
      SyncFilters.applyRules(catalog, r.preSync, r.filters, r.postSync)
    })
    // ONE append job for all rules' messages, not one per message frame —
    // same rows either way (shared Messages schema), but a many-rules
    // dischema otherwise pays a sequential write job per rule.
    if (ruleMessages.nonEmpty)
      sub("rule-msg-write")(ErrorSink.writeFeedbackErrors(
        org.apache.spark.sql.graft.ExpressionBridge.flatUnion(ruleMessages),
        cfg.workingDir, "business_rules"))

    val contractErrors = ErrorSink.readFeedbackErrors(spark, cfg.workingDir, "data_contract")
    // EVERY catalog entity checkpoints — declared, Original copies, and
    // rule-derived entities (a group_by's new_entity_name) — mirroring the
    // reference's business-rules write loop (ref: pipeline.py:614-637,
    // planets' largest_satellites and Originalplanets land as parquet).
    // Contract record rejection applies to non-Original entities only;
    // derived entities without a record index pass through untouched.
    // The final checkpoint writes are independent per entity dir — they
    // parallelize like the other stage loops (the catalog itself is frozen
    // by this point; rules above ran sequentially).
    def rejected(name: String): DataFrame = {
      val entity = catalog(name)
      if (!name.startsWith("Original") &&
        entity.columns.contains(Contract.RecordIndexColumn))
        Contract.filterContractErrors(entity,
          contractErrors.where(col("Entity") === name))
      else entity
    }
    if (cfg.singleTableLayout) {
      // One union write + one count job over the written table — and ONE
      // GLOBAL rejection anti-join on (entity, record index) instead of a
      // per-entity anti-join plan (200 catalog entities was 200 error-file
      // scans and 200 join branches in the union plan; the probe measured
      // plan construction dominating). Rows without a record index (Original
      // snapshots, derived entities) carry a null key, which an anti-join
      // never matches — exactly the pass-through the per-entity path gives
      // them.
      val stageDir = s"${cfg.workingDir}/business_rules"
      val ri = Contract.RecordIndexColumn
      val riKey = "__graft_ri__"
      val (dcTable, _) = dcSingle.get
      val encoded = catalog.names.map { name =>
        val df = catalog(name)
        val base = name.stripPrefix("Original")
        // Original* snapshots are the PRE-RULES typed frames — byte-identical
        // to the data_contract payloads — so they copy payload rows straight
        // from the previous stage table, skipping a decode+re-encode branch
        // per entity (half the catalog). Guarded by frame identity: a rule
        // that (ab)used an Original name would replace the catalog entry.
        val snapshotCopy = name.startsWith("Original") &&
          originals.get(name).exists(_ eq df)
        if (snapshotCopy)
          dcTable.where(col(StageIO.EntityCol) === base)
            .select(col(StageIO.PayloadCol), lit(name).as(StageIO.EntityCol),
              lit(null).cast("long").as(riKey))
        else {
          val keyCol =
            if (!name.startsWith("Original") && df.columns.contains(ri))
              col(s"`$ri`").cast("long")
            else lit(null).cast("long")
          StageIO.encodeEntity(name, df, Seq(keyCol.as(riKey)))
        }
      }
      val encodedU = org.apache.spark.sql.graft.ExpressionBridge.flatUnion(encoded)
      val bad = contractErrors
        .where(col("FailureType") === "record" && col("Status") =!= "informational")
        .select(col("Entity").as(StageIO.EntityCol), col("RecordIndex").as(riKey))
        .distinct()
      val kept = encodedU.join(bad, Seq(StageIO.EntityCol, riKey), "left_anti").drop(riKey)
      sub("table-write")(StageIO.writeEncoded(spark, stageDir, kept,
        catalog.names.map(n => n -> catalog(n).schema)))
      val counts = sub("counts")(StageIO.entityCounts(StageIO.readTable(spark, stageDir)._1))
      catalog.names.map(n => n -> counts.getOrElse(n, 0L)).toMap
    } else
      parEntities(catalog.names, cfg.entityParallelism, cfg.entityStageTimeoutSec) { name =>
        // Row count observed ON the write itself — no second job
        // re-reading the parquet just to count what was written.
        val obs = org.apache.spark.sql.Observation()
        rejected(name).observe(obs, count(lit(1)).as("n")).write.mode("overwrite")
          .parquet(s"${cfg.workingDir}/business_rules/$name")
        name -> obs.get("n").asInstanceOf[Long]
      }.toMap
  }

  /** Stage 4: aggregate + detail + summary report tables from every stage's
    * JSONL (the summary block + Type x Table counts are the offline
    * equivalents of the reference's Excel summary sheet,
    * ref: reporting/excel_report.py:24-107).
    */
  def errorReport(spark: SparkSession, cfg: SubmissionConfig): DataFrame =
    errorReportFrom(spark, cfg, ErrorSink.readAllFeedbackErrors(spark, cfg.workingDir))

  /** [[errorReport]] over an already-loaded (typically persisted) message
    * frame, so a caller that needs the frame for statistics too reads the
    * stage JSONL once, not once per consumer.
    */
  def errorReportFrom(spark: SparkSession, cfg: SubmissionConfig,
                      all: DataFrame): DataFrame = {
    val agg = ErrorSink.aggregateReport(all)
    agg.coalesce(1).write.mode("overwrite")
      .parquet(s"${cfg.workingDir}/error_reports/aggregate")
    ErrorSink.detailReport(all).coalesce(1).write.mode("overwrite")
      .parquet(s"${cfg.workingDir}/error_reports/detail")
    ErrorSink.summaryTable(all).coalesce(1).write.mode("overwrite")
      .parquet(s"${cfg.workingDir}/error_reports/summary_table")
    ErrorSink.summaryReport(all).coalesce(1).write.mode("overwrite")
      .parquet(s"${cfg.workingDir}/error_reports/summary")
    agg
  }

  /** Run many submissions concurrently — Spark schedules the jobs fairly
    * across one session (ref: pipeline.py:957 ThreadPoolExecutor(7); Scala
    * futures over the shared SparkSession are the JVM equivalent). One
    * submission's failure does not abort the others.
    */
  def runAll(spark: SparkSession, cfgs: Seq[SubmissionConfig],
             parallelism: Int = 7): Map[String, Either[Throwable, PipelineResult]] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = cfgs.map { cfg =>
        Future(cfg.submissionId ->
          (try Right(run(spark, cfg)) catch { case e: Throwable => Left(e) }))
      }
      Await.result(Future.sequence(fs), Duration.Inf).toMap
    } finally pool.shutdown()
  }

  /** Session for one submission. The single-table layout gets a
    * submission-local clone (newSession — concurrent submissions on the
    * shared session keep their own confs; extensions and the context are
    * inherited) with whole-stage codegen off: that layout targets MANY
    * SMALL entities, where each stage is one query with a distinct plan
    * branch per entity and codegen pays a Janino compile per branch for
    * rows too few to repay it (EntityProbe: interpreted mode ~1.6x faster
    * end-to-end at 100 entities). newSession starts from the builder
    * defaults, NOT the caller's runtime confs (session timezone, shuffle
    * partitions, ...) — copy them over so the two layouts differ only in
    * layout + the codegen override, not in silently-reset SQL behavior.
    */
  private[pipeline] def sessionFor(spark0: SparkSession,
                                   singleTableLayout: Boolean): SparkSession =
    if (!singleTableLayout) spark0
    else {
      val s = spark0.newSession()
      spark0.conf.getAll.foreach { case (k, v) =>
        if (s.conf.isModifiable(k) && s.conf.getOption(k) != Some(v))
          s.conf.set(k, v)
      }
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      s
    }

  /** Full run with audit status transitions and submission statistics. */
  def run(spark0: SparkSession, cfg: SubmissionConfig): PipelineResult = {
    // The single-table layout targets MANY SMALL entities, where each stage
    // is one query with a distinct plan branch per entity: whole-stage
    // codegen pays a Janino compile per branch for rows too few to repay it
    // (EntityProbe: interpreted mode ~1.6x faster end-to-end at 100
    // entities). Session-LOCAL via newSession — concurrent submissions on
    // the shared session keep their own confs; extensions and the context
    // are inherited.
    val spark = sessionFor(spark0, cfg.singleTableLayout)
    val audit = cfg.auditDir.map(new AuditManager(spark, _))
    audit.foreach { a =>
      a.addSubmissionInfo(cfg.submissionId, cfg.dischema.entities.map(_.name).mkString(","),
        cfg.dataFile, fileExtension(cfg.dataFile))
      a.markStatus(cfg.submissionId, "received")
    }
    // probe hook: -Dgraft.pipeline.debug prints per-service walls (stage
    // attribution for EntityProbe/SubmissionProbe runs)
    def staged[T](name: String)(f: => T): T =
      if (sys.props.get("graft.pipeline.debug").isEmpty) f
      else {
        val t0 = System.nanoTime(); val r = f
        System.err.println(
          f"[pipeline] ${cfg.submissionId} $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
        r
      }
    try {
      // "file_transformation" is the reference's stage name (the feature
      // files assert it verbatim, and Auditing.StageOrder keys on it)
      audit.foreach(_.markStatus(cfg.submissionId, "file_transformation"))
      staged("transform")(fileTransformation(spark, cfg))
      audit.foreach(_.markStatus(cfg.submissionId, "data_contract"))
      val validationFailed = staged("data_contract")(dataContract(spark, cfg))
      audit.foreach(_.markStatus(cfg.submissionId, "business_rules"))
      val allCounts = staged("business_rules")(businessRules(spark, cfg))
      val declared = cfg.dischema.entities.map(_.name)
      val counts = declared.map(n => n -> allCounts.getOrElse(n, 0L)).toMap
      audit.foreach(_.markStatus(cfg.submissionId, "error_report"))
      val all = ErrorSink.readAllFeedbackErrors(spark, cfg.workingDir).persist()
      errorReportFrom(spark, cfg, all)
      audit.foreach { a =>
        // one aggregation job for all three statistics, not three count()
        // jobs over the persisted frame (count(when) skips nulls, so an
        // empty frame yields 0s)
        val stats = all.agg(
          count(when(col("FailureType") === "submission"
            && col("Status") =!= "informational", true)).as("subm"),
          count(when(col("FailureType") === "record"
            && col("Status") =!= "informational", true)).as("rec"),
          count(when(col("Status") === "informational", true)).as("warn")).head()
        // record_count = the SUBMITTED record count of the MAIN entity: the
        // Original copy is the pre-rules, pre-rejection frame, and the main
        // entity is the document's 'entity' template parameter (ref:
        // pipeline.py:639-643 global_variables.get('entity', dataset_id) —
        // books counts nested_books' 4 authors, not header + authors);
        // without a parameter, all declared entities count
        // resolve against what actually ran (allCounts) — the parameter may
        // name a rule-DERIVED entity (valid in the reference, which uses
        // global_variables['entity'] as-is); only an entity that produced
        // no counts at all falls back to the sum of declared entities
        val statEntities = cfg.dischema.parameters.get("entity")
          .filter(e => allCounts.contains(e) || allCounts.contains(s"Original$e"))
          .map(Seq(_)).getOrElse(declared)
        val submitted = statEntities
          .map(n => allCounts.getOrElse(s"Original$n", allCounts.getOrElse(n, 0L))).sum
        a.addStatistics(cfg.submissionId,
          recordCount = submitted,
          submissionRejections = stats.getLong(0),
          recordRejections = stats.getLong(1),
          warnings = stats.getLong(2))
        a.markStatus(cfg.submissionId, "finished",
          submissionResult = Some(if (validationFailed) "validation_failed" else "success"))
      }
      all.unpersist()
      PipelineResult(validationFailed, counts, "finished")
    } catch {
      case e: Throwable =>
        ErrorSink.writeProcessingError(spark, cfg.workingDir, "pipeline",
          Option(e.getMessage).getOrElse(e.getClass.getName))
        audit.foreach(_.markStatus(cfg.submissionId, "failed",
          submissionResult = Some("processing_error")))
        throw e
    }
  }
}
