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
      Some(Messages.notifyDF(catalog(entity), entity, expression, reporting, excluded,
        catalog.keyFields.getOrElse(entity, Nil)))

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
      if (j.performIntegrityCheck)
        assertOneToOne(catalog, j.entityName, j.targetName, j.joinCondition)
      val (src, joined) = performJoin(catalog, j.entityName, j.targetName, j.joinCondition, "left")
      catalog(outName) = resolveJoinNameConflicts(src, joined, j.entityName, j.newColumns)
      None

    case j: HasMatch =>
      // Left join then re-evaluate the condition as the match flag
      // (ref: spark/rules.py:210-229 — coalesce(cond, false)).
      if (j.performIntegrityCheck)
        assertOneToOne(catalog, j.entityName, j.targetName, j.joinCondition)
      val (_, joined) = performJoin(catalog, j.entityName, j.targetName, j.joinCondition, "left")
      val result = joined
        .select(col(s"${j.entityName}.*"),
          coalesce(expr(j.joinCondition), lit(false)).alias(j.columnName))
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

  // ------------------------------------------------------------ 1:1 integrity

  /** Conjunctive analysis of a join condition between `src` and `tgt`:
    * equality pairs plus single-side residual predicates. `None` when the
    * condition is anything more exotic (parentheses, OR, cross-side
    * inequality) — callers fall back to the generic check.
    */
  private[graft] final case class EquiCondition(
      equis: Seq[(String, String)], srcPreds: Seq[String], tgtPreds: Seq[String])

  private[graft] def analyzeCondition(cond: String, src: String, tgt: String): Option[EquiCondition] = {
    if (cond.exists(c => c == '(' || c == ')')) return None
    val conjuncts = splitTopLevelAnd(cond)
    def refs(c: String, alias: String): Boolean =
      java.util.regex.Pattern
        .compile("(?i)(?<![A-Za-z0-9_`])" + java.util.regex.Pattern.quote(alias) + "`?\\s*\\.")
        .matcher(c).find()
    val colRef = ("(?i)^\\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\\s*\\.\\s*`?" +
      "([A-Za-z_][A-Za-z0-9_]*)`?\\s*$").r
    val equis = Seq.newBuilder[(String, String)]
    val srcPreds = Seq.newBuilder[String]
    val tgtPreds = Seq.newBuilder[String]
    conjuncts.foreach { c =>
      val (hasSrc, hasTgt) = (refs(c, src), refs(c, tgt))
      if (hasSrc && hasTgt) {
        if (c.matches("(?s).*(<=|>=|!=|<>|<|>).*") || c.count(_ == '=') != 1) return None
        val Array(l, r) = c.split("=", 2)
        (l, r) match {
          case (colRef(la, lc), colRef(ra, rc))
              if la.equalsIgnoreCase(src) && ra.equalsIgnoreCase(tgt) =>
            equis += ((lc, rc))
          case (colRef(la, lc), colRef(ra, rc))
              if la.equalsIgnoreCase(tgt) && ra.equalsIgnoreCase(src) =>
            equis += ((rc, lc))
          case _ => return None
        }
      } else if (hasSrc) srcPreds += c
      else if (hasTgt) tgtPreds += c
      else return None // unqualified reference — side unknown, be safe
    }
    val result = EquiCondition(equis.result(), srcPreds.result(), tgtPreds.result())
    if (result.equis.isEmpty) None else Some(result)
  }

  /** Split on top-level AND, respecting quotes (no paren nesting — the
    * analyzer bails on parentheses before calling this).
    */
  private def splitTopLevelAnd(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur += c; if (c == quote) quote = 0; i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; cur += c; i += 1
      } else if ((i + 3 <= s.length) && s.substring(i, i + 3).equalsIgnoreCase("and")
          && (i == 0 || !s.charAt(i - 1).isLetterOrDigit && s.charAt(i - 1) != '_')
          && (i + 3 == s.length || !s.charAt(i + 3).isLetterOrDigit && s.charAt(i + 3) != '_')) {
        out += cur.result().trim; cur.clear(); i += 3
      } else { cur += c; i += 1 }
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Throw when the left join `src -> tgt` under `condition` would match some
    * source row more than once.
    *
    * Fast path (equi conditions, the overwhelmingly common case): a source
    * row can multi-match only if the (filtered) target holds DUPLICATE key
    * tuples that at least one (filtered) source row joins to — so the check
    * aggregates the TARGET keys, keeps the (usually empty) duplicate set,
    * and semi-joins it against distinct source keys. The big source side is
    * scanned once for its key columns only and never shuffled at full width;
    * the reference runs two full `count()` jobs over the joined plan
    * (ref: spark/rules.py:250-251).
    *
    * Fallback (theta conditions): one aggregation over the joined plan —
    * joined rows == distinct source row-ids — which Catalyst prunes to the
    * condition's columns.
    */
  private def assertOneToOne(catalog: EntityCatalog, entity: String, target: String,
                             condition: String): Unit = {
    val violated = analyzeCondition(condition, entity, target) match {
      case Some(ec) =>
        val srcF = ec.srcPreds.foldLeft(catalog(entity).alias(entity))((d, p) => d.where(expr(p)))
        val tgtF = ec.tgtPreds.foldLeft(catalog(target).alias(target))((d, p) => d.where(expr(p)))
        val keyNames = ec.equis.indices.map(i => s"__k$i")
        val tgtKeys = tgtF.select(ec.equis.zipWithIndex.map { case ((_, t), i) => col(s"`$t`").as(s"__k$i") }: _*)
        val srcKeys = srcF.select(ec.equis.zipWithIndex.map { case ((s, _), i) => col(s"`$s`").as(s"__k$i") }: _*)
        val dupKeys = tgtKeys.groupBy(keyNames.map(col): _*)
          .agg(count(lit(1)).as("__n")).where(col("__n") > 1).drop("__n")
        !dupKeys.join(srcKeys, keyNames, "left_semi").isEmpty
      case None =>
        val rid = "__graft_rid__"
        val src = catalog(entity).withColumn(rid, monotonically_increasing_id()).alias(entity)
        val joined = src.join(catalog(target).alias(target), expr(condition), "left")
        val row = joined.agg(count(lit(1)).as("n"), count_distinct(col(rid)).as("d")).head()
        row.getLong(0) != row.getLong(1)
    }
    if (violated)
      throw new ConstraintException(
        s"Multiple matches for some records from '$entity' for condition '$condition'",
        s"records in source entity ('$entity') must match at most a single record " +
          s"in the target ($target)")
  }

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
