package graft.rules

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.{MultiExpr, Step}
import graft.config.Step._

/** Interprets the 19-step rule vocabulary over an [[EntityCatalog]].
  *
  * Semantics follow the reference's Spark step implementations
  * (ref: backends/implementations/spark/rules.py:106-421) but the physical
  * strategies are Spark-first where the reference is driver-bound:
  *
  *  - 1:1 / has_match integrity checks run as ONE aggregation over the joined
  *    plan (count vs distinct-source-row count) instead of the reference's two
  *    `count()` jobs (ref: spark/rules.py:217-218, 250-251).
  *  - `join_header` embeds the single-row target via a broadcast cross join
  *    instead of a driver `collect()` + literal struct (ref: spark/rules.py:278).
  *  - `identify_orphans` is a broadcast-friendly semi/anti union — no uuid
  *    keys, no row-explosion, no join-back groupBy (ref: spark/rules.py:339-374).
  *  - notifications are DataFrame projections, never driver iteration
  *    (see [[Messages.notifyDF]]).
  */
object StepInterpreter {

  /** Evaluate one step, mutating `catalog`; returns the messages emitted by
    * the step (only `Notify` emits) as an optional DataFrame.
    */
  def evaluate(catalog: EntityCatalog, step: Step): Option[DataFrame] = step match {

    case Add(entity, colName, expression, newName) =>
      catalog(newName.getOrElse(entity)) = catalog(entity).withColumn(colName, expr(expression))
      None

    case Remove(entity, colName, newName) =>
      catalog(newName.getOrElse(entity)) = catalog(entity).drop(colName)
      None

    case Select(entity, columns, distinct, newName) =>
      val selected = catalog(entity).select(columns.toColumns: _*)
      catalog(newName.getOrElse(entity)) = if (distinct) selected.distinct() else selected
      None

    case GroupBy(entity, groupBy, aggColumns, pivotColumn, pivotValues, newName) =>
      val df = catalog(entity)
      val grouped = df.groupBy(groupBy.toColumns: _*)
      val pivoted = pivotColumn match {
        case Some(pc) => pivotValues match {
          case Some(vs) => grouped.pivot(pc, vs)
          case None     => grouped.pivot(pc)
        }
        case None => grouped
      }
      val aggCols = aggColumns.toColumns
      val result =
        if (aggCols.nonEmpty) pivoted.agg(aggCols.head, aggCols.tail: _*)
        else pivoted.agg(Map.empty[String, String])
      catalog(newName.getOrElse(entity)) = result
      None

    case Filter(entity, expression, newName) =>
      catalog(newName.getOrElse(entity)) = catalog(entity).where(expr(expression))
      None

    case Notify(entity, expression, reporting, excluded) =>
      Some(Messages.notifyDF(catalog(entity), entity, expression, reporting, excluded))

    case j: SemiJoin =>
      val (_, joined) = performJoin(catalog, j.entityName, j.targetName, j.joinCondition, "left_semi")
      catalog(j.newEntityName.getOrElse(j.entityName)) = joined
      None

    case j: AntiJoin =>
      val (_, joined) = performJoin(catalog, j.entityName, j.targetName, j.joinCondition, "left_anti")
      catalog(j.newEntityName.getOrElse(j.entityName)) = joined
      None

    case j: LeftJoin =>
      val (src, joined) = performJoin(catalog, j.entityName, j.targetName, j.joinCondition, "left")
      catalog(j.newEntityName.getOrElse(j.entityName)) =
        resolveJoinNameConflicts(src, joined, j.entityName, j.newColumns)
      None

    case j: InnerJoin =>
      val (src, joined) = performJoin(catalog, j.entityName, j.targetName, j.joinCondition, "inner")
      catalog(j.newEntityName.getOrElse(j.entityName)) =
        resolveJoinNameConflicts(src, joined, j.entityName, j.newColumns)
      None

    case j: OneToOneJoin =>
      val outName = j.newEntityName.getOrElse(j.entityName)
      if (j.performIntegrityCheck) {
        // Source rows are tagged with a per-row id BEFORE the join so that one
        // aggregation over the joined plan decides integrity: the join is 1:1
        // iff total joined rows == distinct source ids. Single Spark action,
        // vs the reference's two full `count()` jobs (spark/rules.py:250-251).
        val rid = "__graft_rid__"
        val src = catalog(j.entityName).withColumn(rid, monotonically_increasing_id())
        val srcAliased = src.alias(j.entityName)
        val tgt = catalog(j.targetName).alias(j.targetName)
        val joined = srcAliased.join(tgt, expr(j.joinCondition), "left")
        val row = joined.agg(count(lit(1)).as("n"), count_distinct(col(rid)).as("d")).head()
        if (row.getLong(0) != row.getLong(1))
          throw new ConstraintException(
            s"Multiple matches for some records from '${j.entityName}' for condition '${j.joinCondition}'",
            s"records in source entity ('${j.entityName}') must match at most a single record " +
              s"in the target (${j.targetName})")
        val srcNoRid = src.drop(rid).alias(j.entityName)
        catalog(outName) = resolveJoinNameConflicts(
          srcNoRid, joined.drop(rid), j.entityName, j.newColumns)
      } else {
        val (src, joined) = performJoin(catalog, j.entityName, j.targetName, j.joinCondition, "left")
        catalog(outName) = resolveJoinNameConflicts(src, joined, j.entityName, j.newColumns)
      }
      None

    case j: HasMatch =>
      // Left join then re-evaluate the condition as the match flag
      // (ref: spark/rules.py:210-229 — coalesce(cond, false)).
      val rid = "__graft_rid__"
      val needCheck = j.performIntegrityCheck
      val srcBase = catalog(j.entityName)
      val src = (if (needCheck) srcBase.withColumn(rid, monotonically_increasing_id())
                 else srcBase).alias(j.entityName)
      val tgt = catalog(j.targetName).alias(j.targetName)
      val joined = src.join(tgt, expr(j.joinCondition), "left")
      if (needCheck) {
        val row = joined.agg(count(lit(1)).as("n"), count_distinct(col(rid)).as("d")).head()
        if (row.getLong(0) != row.getLong(1))
          throw new ConstraintException(
            s"Multiple matches for some records from '${j.entityName}' for condition '${j.joinCondition}'",
            s"records in source entity ('${j.entityName}') must match at most a single record " +
              s"in the target (${j.targetName})")
      }
      val result = joined
        .select(col(s"${j.entityName}.*"),
          coalesce(expr(j.joinCondition), lit(false)).alias(j.columnName))
        .drop(rid)
      catalog(j.newEntityName.getOrElse(j.entityName)) = result
      None

    case JoinHeader(entity, target, headerCol, newName) =>
      // The reference collect()s the 1-row target and rebuilds it as a struct
      // literal (spark/rules.py:272-297). A broadcast cross join gives the
      // same result without driver-side literal construction and stays a
      // map-side operation at any source size. The cardinality guard reads at
      // most 2 rows.
      val tgt = catalog(target)
      val nRows = tgt.limit(2).count()
      if (nRows != 1)
        throw new ConstraintException(
          s"Unable to join header '$target' to '$entity' as it contains " +
            s"multiple entries (expected 1, got $nRows)",
          s"Header entity '$target' must contain a single record")
      val headerStruct = tgt.select(struct(tgt.columns.map(c => col(s"`$c`")).toSeq: _*).as(headerCol))
      catalog(newName.getOrElse(entity)) = catalog(entity).crossJoin(broadcast(headerStruct))
      None

    case Union(entity, target, newName) =>
      catalog(newName.getOrElse(entity)) = unionByNameCaseInsensitive(catalog(entity), catalog(target))
      None

    case IdentifyOrphans(entity, target, condition, newName) =>
      // Orphan = source row with no match under the condition. The reference
      // tags rows with uuid keys, left-joins (exploding on multi-matches),
      // group-bys and joins back (spark/rules.py:339-374). Semi + anti joins
      // compute the same flag with no row explosion and no join-back.
      val src = catalog(entity)
      val flag = "IsOrphaned"
      val srcAliased = src.alias(entity)
      val tgt = catalog(target).alias(target)
      val matched = srcAliased.join(tgt, expr(condition), "left_semi")
      val orphaned = srcAliased.join(tgt, expr(condition), "left_anti")
      val result =
        if (!src.columns.contains(flag)) {
          matched.withColumn(flag, lit(false)).unionByName(orphaned.withColumn(flag, lit(true)))
        } else {
          // OR into the pre-existing flag (ref: spark/rules.py:360-372).
          val keep = src.columns.filterNot(_ == flag).map(c => col(s"`$c`")).toSeq
          matched.select(keep :+ col(flag).as(flag): _*)
            .unionByName(orphaned.select(keep :+ (col(flag) || lit(true)).as(flag): _*))
        }
      catalog(newName.getOrElse(entity)) = result
      None

    case CopyEntity(entity, newName) =>
      catalog(newName) = catalog(entity); None

    case RenameEntity(entity, newName) =>
      catalog.rename(entity, newName); None

    case RemoveEntity(entity) =>
      catalog.remove(entity); None

    case RemoveEntities(names) =>
      names.foreach(catalog.remove); None
  }

  /** Evaluate a sequence of steps, returning all emitted message frames. */
  def evaluateAll(catalog: EntityCatalog, steps: Seq[Step]): Seq[DataFrame] =
    steps.flatMap(s => evaluate(catalog, s))

  private def performJoin(catalog: EntityCatalog, entity: String, target: String,
                          condition: String, joinType: String): (DataFrame, DataFrame) = {
    val src = catalog(entity).alias(entity)
    val tgt = catalog(target).alias(target)
    (src, src.join(tgt, expr(condition), joinType))
  }

  /** Keep all source columns, append `newColumns`, then deduplicate column
    * names case-insensitively keeping the LAST occurrence's value and casing,
    * in first-occurrence order (ref: spark/rules.py:168-208).
    */
  private[graft] def resolveJoinNameConflicts(source: DataFrame, joined: DataFrame,
                                              entityName: String,
                                              newColumns: MultiExpr): DataFrame = {
    val sourceCols: Seq[Column] =
      source.columns.toSeq.map(c => col(s"`$entityName`.`$c`").as(c))
    val allCols = sourceCols ++ newColumns.toColumns
    val projected = joined.select(allCols: _*)

    val names = projected.columns
    // upper-cased name -> (index of last occurrence, casing of last occurrence)
    val byUpper = scala.collection.mutable.LinkedHashMap.empty[String, (Int, String)]
    names.zipWithIndex.foreach { case (n, i) => byUpper.update(n.toUpperCase, (i, n)) }

    val tempNames = names.indices.map(i => s"__c$i")
    val renamed = projected.toDF(tempNames: _*)
    val kept = byUpper.values.toSeq.map { case (idx, casing) => col(s"__c$idx").as(casing) }
    renamed.select(kept: _*)
  }

  /** Union by name, case-insensitive: source casing and column order win,
    * missing columns are null-padded, extra target columns are appended in
    * target order (ref: spark/rules.py:299-337).
    */
  private[graft] def unionByNameCaseInsensitive(source: DataFrame, target: DataFrame): DataFrame = {
    val sourceNames = scala.collection.mutable.LinkedHashMap(
      source.columns.map(c => c.toUpperCase -> c).toIndexedSeq: _*)
    val targetNames = scala.collection.mutable.LinkedHashMap(
      target.columns.map(c => c.toUpperCase -> c).toIndexedSeq: _*)

    val allUpper = sourceNames.keys.toSeq ++ targetNames.keys.filterNot(sourceNames.contains)

    val (sourceCols, targetCols) = allUpper.map { upper =>
      (sourceNames.get(upper), targetNames.get(upper)) match {
        case (Some(s), Some(t)) => (col(s"`$s`"), col(s"`$t`").as(s))
        case (Some(s), None)    => (col(s"`$s`"), lit(null).as(s))
        case (None, Some(t))    => (lit(null).as(t), col(s"`$t`"))
        case (None, None)       => throw new IllegalStateException("unreachable")
      }
    }.unzip

    source.select(sourceCols: _*).union(target.select(targetCols: _*))
  }
}
