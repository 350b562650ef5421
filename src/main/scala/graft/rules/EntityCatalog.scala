package graft.rules

import org.apache.spark.sql.DataFrame
import scala.collection.immutable.ListMap

/** Raised when a step violates an engine constraint (1:1 join integrity,
  * header cardinality, refdata immutability...). Mirrors the reference's
  * `ConstraintError` (ref: backends/exceptions.py).
  */
final class ConstraintException(message: String, val constraint: String = "")
    extends RuntimeException(message)

/** A mutable namespace of named entities (tables) plus an immutable
  * reference-data namespace resolved through the `refdata_` prefix.
  *
  * Mirrors the reference's `EntityManager` (ref: backends/base/core.py:59-124):
  * reads of `refdata_<name>` resolve from the refdata mapping; writes to a
  * `refdata_` name raise.
  */
final class EntityCatalog(
    initial: Map[String, DataFrame],
    val refdata: Map[String, DataFrame] = Map.empty,
    val keyFields: Map[String, Seq[String]] = Map.empty, // entity -> user-facing key fields
    refdataProvider: Option[String => Option[DataFrame]] = None // lazy refdata source
) {
  val RefdataPrefix = "refdata_"

  private var entities: ListMap[String, DataFrame] = ListMap(initial.toSeq: _*)

  def apply(name: String): DataFrame =
    if (name.startsWith(RefdataPrefix)) {
      val key = name.stripPrefix(RefdataPrefix)
      refdata.get(key)
        .orElse(refdataProvider.flatMap(p => p(key)))
        .getOrElse(throw new NoSuchElementException(s"reference entity not found: $name"))
    } else
      entities.getOrElse(name, throw new NoSuchElementException(s"entity not found: $name"))

  def update(name: String, df: DataFrame): Unit = {
    if (name.startsWith(RefdataPrefix))
      throw new ConstraintException(
        s"cannot write to reference data entity '$name'",
        "reference data entities are immutable")
    entities = entities.updated(name, df)
  }

  def remove(name: String): Unit = {
    if (name.startsWith(RefdataPrefix))
      throw new ConstraintException(
        s"cannot remove reference data entity '$name'",
        "reference data entities are immutable")
    if (!entities.contains(name))
      throw new NoSuchElementException(s"entity not found: $name")
    entities = entities.removed(name)
  }

  def rename(from: String, to: String): Unit = { val df = apply(from); remove(from); update(to, df) }

  def contains(name: String): Boolean =
    if (name.startsWith(RefdataPrefix)) {
      val key = name.stripPrefix(RefdataPrefix)
      refdata.contains(key) || refdataProvider.exists(p => p(key).isDefined)
    } else entities.contains(name)

  /** Entity names in insertion order (excluding refdata). */
  def names: Seq[String] = entities.keys.toSeq

  def toMap: Map[String, DataFrame] = entities
}

object EntityCatalog {
  def apply(entities: (String, DataFrame)*): EntityCatalog = new EntityCatalog(entities.toMap)
  def apply(entities: Map[String, DataFrame], refdata: Map[String, DataFrame],
            keyFields: Map[String, Seq[String]] = Map.empty): EntityCatalog =
    new EntityCatalog(entities, refdata, keyFields)
}
