package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr
import graft.config.{DeferredFilter, Step}

/** The synchronised ("deferred") filter protocol: each record-failure filter
  * adds a guard column; notifications fire on `NOT guard`; rows are removed
  * only after ALL filters on the entity have been evaluated, so one record
  * can report every error it triggers (multi-error-per-record semantics).
  *
  * Mirrors the reference's `apply_sync_filters`
  * (ref: backends/base/rules.py:356-555) with the same subtleties:
  *  - record_failure guards evaluate against the progressively-modified
  *    entity; warning/submission notifications evaluate `NOT (expr)` against
  *    the UNMODIFIED entity;
  *  - guard columns are excluded from reported records;
  *  - the survivor predicate is `(g IS NOT NULL AND g)` AND-ed over all
  *    guards (a null guard drops the row without a message, as in the
  *    reference);
  *  - guard columns are removed afterwards.
  */
object SyncFilters {

  /** Apply all filters; mutates `catalog` entities to survivors and returns
    * the emitted message frames (one per notifying filter).
    */
  def apply(catalog: EntityCatalog, filters: Seq[DeferredFilter]): Seq[DataFrame] = {
    val messages = Seq.newBuilder[DataFrame]

    filters.groupBy(_.entityName).toSeq.sortBy(_._1).foreach { case (entityName, rules) =>
      val unmodified = catalog(entityName)
      var modified = unmodified
      val guardCols = Seq.newBuilder[String]
      var guardIdx = 0

      val keys = catalog.keyFields.getOrElse(entityName, Nil)
      rules.foreach { rule =>
        if (rule.reporting.emit == "record_failure") {
          val guard = s"__filter_${guardIdx}__"
          guardIdx += 1
          val soFar = { guardCols += guard; guardCols.result() }
          modified = modified.withColumn(guard, expr(rule.expression))
          messages += Messages.notifyDF(
            modified, entityName, s"NOT $guard", rule.reporting,
            excludedColumns = soFar, keyFields = keys)
        } else {
          messages += Messages.notifyDF(
            unmodified, entityName, s"NOT (${rule.expression})", rule.reporting,
            keyFields = keys)
        }
      }

      val guards = guardCols.result()
      if (guards.nonEmpty) {
        val survive = guards.map(g => s"(`$g` IS NOT NULL AND `$g`)").mkString(" AND ")
        catalog(entityName) = modified.where(expr(survive)).drop(guards: _*)
      }
    }
    messages.result()
  }

  /** Full business-rules stage: pre-sync steps, sync filters, post-sync steps
    * (ref: backends/base/rules.py:557-675).
    */
  def applyRules(catalog: EntityCatalog,
                 preSync: Seq[Step],
                 filters: Seq[DeferredFilter],
                 postSync: Seq[Step] = Nil): Seq[DataFrame] = {
    val pre = StepInterpreter.evaluateAll(catalog, preSync)
    val sync = apply(catalog, filters)
    val post = StepInterpreter.evaluateAll(catalog, postSync)
    pre ++ sync ++ post
  }
}
