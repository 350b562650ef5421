package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join splitting covers joins at runtime; hot-key AGGREGATIONS
  * still funnel every row of a heavy key through one reducer when the
  * aggregate itself is expensive per group. Salting splits each key into
  * `saltFactor` sub-keys for a partial aggregate, then merges the partials —
  * two bounded shuffles instead of one skewed one.
  */
object Skew {

  /** A decomposable aggregate: `partial` runs per (keys, salt) sub-group,
    * `merge` combines sub-group partials into the final value.
    */
  final case class SaltedAgg(name: String, partial: Column, merge: Column => Column)

  object SaltedAgg {
    def sumOf(c: String, as: String = null): SaltedAgg =
      SaltedAgg(Option(as).getOrElse(c), sum(col(s"`$c`")), p => sum(p))
    def countAll(name: String = "count"): SaltedAgg =
      SaltedAgg(name, count(lit(1)), p => sum(p))
    def minOf(c: String, as: String = null): SaltedAgg =
      SaltedAgg(Option(as).getOrElse(c), min(col(s"`$c`")), p => min(p))
    def maxOf(c: String, as: String = null): SaltedAgg =
      SaltedAgg(Option(as).getOrElse(c), max(col(s"`$c`")), p => max(p))
  }

  /** Salted equi-join for KNOWN key skew: each row of the large (skewed)
    * left side gets a deterministic salt in [0, saltFactor); the right side
    * replicates `saltFactor` times; the join key becomes (keys, salt), so a
    * hot key's rows spread over `saltFactor` reducers instead of one. AQE's
    * runtime skew split covers sort-merge joins it can observe — this is
    * the explicit form for when AQE can't help (pre-partitioned inputs, or
    * a right side too big to broadcast but cheap to replicate saltFactor
    * times). Inner and left joins only: the right side's replication makes
    * right/full-outer row accounting wrong by construction.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, not '$joinType'")
    val l = left.withColumn("__salt__",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val r = right.withColumn("__salt__",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, (keys :+ "__salt__").toSeq, joinType).drop("__salt__")
  }

  /** Two-phase salted aggregation: group by (keys, deterministic row salt in
    * [0, saltFactor)) for the partial, then by keys alone for the merge.
    * Output columns: keys ++ one per agg, named by the agg spec.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltFactor: Int,
                      aggs: SaltedAgg*): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(aggs.nonEmpty, "at least one aggregate required")
    val salted = df.withColumn("__salt__",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)))
    val partialCols = aggs.zipWithIndex.map { case (a, i) => a.partial.as(s"__p$i") }
    val partial = salted
      .groupBy((keys :+ "__salt__").map(c => col(s"`$c`")): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val mergeCols = aggs.zipWithIndex.map { case (a, i) => a.merge(col(s"__p$i")).as(a.name) }
    partial
      .groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
  }
}
