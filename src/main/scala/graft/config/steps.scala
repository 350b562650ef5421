package graft.config

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Multiple-expression forms accepted by step configs.
  *
  * Mirrors the reference's `MultipleExpressions` union
  * (ref: src/dve/core_engine/type_hints.py:62-91 — mapping{expr→alias} |
  * list[expr] | top-level-comma-separated string), parsed to Columns as in
  * src/dve/core_engine/backends/implementations/spark/utilities.py:92-104.
  */
sealed trait MultiExpr {
  def toColumns: Seq[Column] = this match {
    case MultiExpr.Exprs(xs)   => xs.map(expr)
    case MultiExpr.Aliased(xs) => xs.map { case (e, a) => expr(e).alias(a) }
    case MultiExpr.MultiAliased(xs) => xs.map {
      case (e, Seq(a)) => expr(e).alias(a)
      case (e, as)     => expr(e).as(as) // generator fan-out: posexplode -> [idx, val]
    }
    case MultiExpr.Raw(s)      => MultiExpr.splitTopLevel(s).map(expr)
  }
  def isEmpty: Boolean = this match {
    case MultiExpr.Exprs(xs)   => xs.isEmpty
    case MultiExpr.Aliased(xs) => xs.isEmpty
    case MultiExpr.MultiAliased(xs) => xs.isEmpty
    case MultiExpr.Raw(s)      => s.trim.isEmpty
  }
}

object MultiExpr {
  /** List form: each element a full SQL expression (may contain `AS alias`). */
  final case class Exprs(xs: Seq[String]) extends MultiExpr
  /** Mapping form: ordered (expression, alias) pairs. */
  final case class Aliased(xs: Seq[(String, String)]) extends MultiExpr
  /** Mapping form where an expression may fan into SEVERAL aliases — the
    * reference accepts {"posexplode(xs)": ["Index", "Value"]}
    * (ref: tests/.../test_rules.py:174-186 multialias select).
    */
  final case class MultiAliased(xs: Seq[(String, Seq[String])]) extends MultiExpr
  /** Single string form, split on top-level commas. */
  final case class Raw(s: String) extends MultiExpr

  val empty: MultiExpr = Exprs(Nil)

  def apply(xs: String*): MultiExpr = Exprs(xs)

  /** Split a multi-expression string on commas not nested inside brackets or
    * quotes (ref: backends/base/utilities.py `_split_multiexpr_string`).
    */
  def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur += c
        if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`'  => quote = c; cur += c
        case '(' | '[' | '{'   => depth += 1; cur += c
        case ')' | ']' | '}'   => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.result().trim; cur.clear()
        case _                 => cur += c
      }
      i += 1
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }
}

/** Where/why a message was emitted; `emit` semantics follow the reference
  * (ref: backends/metadata/rules.py:207-288): `record_failure` removes rows
  * after the sync stage, `submission_failure` fails the submission, and
  * `warning`/`info` are informational.
  */
final case class Reporting(
    code: String,
    message: String,
    emit: String = "record_failure", // record_failure | submission_failure | warning | info
    category: Option[String] = None,
    reportingField: Option[String] = None,
    errorLocation: Option[String] = None,
    reportingEntityOverride: Option[String] = None
) {
  def isInformational: Boolean = emit == "warning" || emit == "info"
  def failureType: String = emit match {
    case "record_failure"     => "record"
    case "submission_failure" => "submission"
    case _                    => "record"
  }
}

/** The rule-step vocabulary (ref: configuration/v1/steps.py:58-343 and
  * backends/metadata/rules.py:339-562) as a Scala ADT. Each step reads
  * `entityName` and writes `newEntityName getOrElse entityName`.
  */
sealed trait Step
object Step {
  final case class Add(entityName: String, columnName: String, expression: String,
                       newEntityName: Option[String] = None) extends Step
  final case class Remove(entityName: String, columnName: String,
                          newEntityName: Option[String] = None) extends Step
  final case class Select(entityName: String, columns: MultiExpr, distinct: Boolean = false,
                          newEntityName: Option[String] = None) extends Step
  final case class GroupBy(entityName: String, groupBy: MultiExpr, aggColumns: MultiExpr,
                           pivotColumn: Option[String] = None,
                           pivotValues: Option[Seq[Any]] = None,
                           newEntityName: Option[String] = None) extends Step
  final case class Filter(entityName: String, expression: String,
                          newEntityName: Option[String] = None) extends Step
  final case class Notify(entityName: String, expression: String,
                          reporting: Reporting,
                          excludedColumns: Seq[String] = Nil) extends Step

  sealed trait Join extends Step {
    def entityName: String; def targetName: String; def joinCondition: String
    def newEntityName: Option[String]
  }
  /** Joins that keep all source columns and append `newColumns` expressions,
    * with case-insensitive last-wins conflict resolution
    * (ref: spark/rules.py:168-208).
    */
  sealed trait NewColumnJoin extends Join { def newColumns: MultiExpr }

  final case class LeftJoin(entityName: String, targetName: String, joinCondition: String,
                            newColumns: MultiExpr = MultiExpr.empty,
                            newEntityName: Option[String] = None) extends NewColumnJoin
  final case class InnerJoin(entityName: String, targetName: String, joinCondition: String,
                             newColumns: MultiExpr = MultiExpr.empty,
                             newEntityName: Option[String] = None) extends NewColumnJoin
  final case class OneToOneJoin(entityName: String, targetName: String, joinCondition: String,
                                newColumns: MultiExpr = MultiExpr.empty,
                                performIntegrityCheck: Boolean = true,
                                newEntityName: Option[String] = None) extends NewColumnJoin
  final case class SemiJoin(entityName: String, targetName: String, joinCondition: String,
                            newEntityName: Option[String] = None) extends Join
  final case class AntiJoin(entityName: String, targetName: String, joinCondition: String,
                            newEntityName: Option[String] = None) extends Join
  final case class HasMatch(entityName: String, targetName: String, joinCondition: String,
                            columnName: String, performIntegrityCheck: Boolean = true,
                            newEntityName: Option[String] = None) extends Join
  final case class JoinHeader(entityName: String, targetName: String, headerColumnName: String,
                              newEntityName: Option[String] = None) extends Step
  final case class Union(entityName: String, targetName: String,
                         newEntityName: Option[String] = None) extends Step
  final case class IdentifyOrphans(entityName: String, targetName: String, joinCondition: String,
                                   newEntityName: Option[String] = None) extends Step
  final case class CopyEntity(entityName: String, newEntityName0: String) extends Step
  final case class RenameEntity(entityName: String, newEntityName0: String) extends Step
  final case class RemoveEntity(entityName: String) extends Step
  final case class RemoveEntities(entityNames: Seq[String]) extends Step

  /** Entity-name bookkeeping (ref: metadata/rules.py:111-123, 183-189). */
  def requiredEntities(s: Step): Set[String] = s match {
    case j: Join              => Set(j.entityName, j.targetName)
    case JoinHeader(e, t, _, _)  => Set(e, t)
    case Union(e, t, _)       => Set(e, t)
    case IdentifyOrphans(e, t, _, _) => Set(e, t)
    case Add(e, _, _, _)      => Set(e)
    case Remove(e, _, _)      => Set(e)
    case Select(e, _, _, _)   => Set(e)
    case GroupBy(e, _, _, _, _, _) => Set(e)
    case Filter(e, _, _)      => Set(e)
    case Notify(e, _, _, _)   => Set(e)
    case CopyEntity(e, _)     => Set(e)
    case RenameEntity(e, _)   => Set(e)
    case RemoveEntity(e)      => Set(e)
    case RemoveEntities(es)   => es.toSet
  }
}

/** A deferred filter: failure emits per-record messages, and record-level
  * failures are removed only after ALL filters on the entity have been
  * evaluated (ref: backends/metadata/rules.py:207-258, base/rules.py:356-555).
  */
final case class DeferredFilter(
    entityName: String,
    expression: String,
    reporting: Reporting
)
