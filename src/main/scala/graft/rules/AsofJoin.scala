package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the single most recent
  * right row with `rightTs <= leftTs` in the same key group — the standard
  * "state at event time" lookup (latest price before a trade, last view
  * before a purchase).
  *
  * Spark has no ASOF JOIN operator; the naive formulation
  * (`l JOIN r ON l.k = r.k AND r.ts <= l.ts` + per-left-row max) explodes
  * to |L|x|R| rows per key BEFORE the filter picks one. This implementation
  * is the union-sort-carry strategy instead: tag both sides, union them,
  * sort each key group by (ts, side) once, and carry the latest right row
  * forward with `last(_, ignoreNulls)` — ONE shuffle of |L|+|R| rows on the
  * key, one sort, zero row amplification, which is the plan that survives
  * 100 TB.
  *
  * Semantics: rights at exactly `leftTs` are visible (inclusive, matching
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`, which the oracle uses); among
  * equal right timestamps the greatest `rightTieBreak` wins
  * (deterministic). The right payload travels as ONE struct, so a null
  * payload FIELD can never splice values from different right rows.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Seq[String], rightTieBreak: String,
               payloadPrefix: String = "asof_"): DataFrame =
    asofImpl(left, right, keyCols, leftTs, rightTs, rightPayload,
      rightTieBreak, payloadPrefix, forward = false)

  /** FORWARD as-of: for each left row, the single EARLIEST right row with
    * `rightTs >= leftTs` in the key group — the "next scheduled slot /
    * next tick after the event" lookup, the mirror of [[asofJoin]]. Same
    * union-sort-carry plan traversed in DESCENDING time order (the carry
    * then holds the smallest right timestamp at-or-after each left row);
    * inclusive at equal timestamps, greatest tiebreak among equal right
    * timestamps, null keys and null left timestamps match nothing.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTs: String, rightTs: String,
                      rightPayload: Seq[String], rightTieBreak: String,
                      payloadPrefix: String = "asof_"): DataFrame =
    asofImpl(left, right, keyCols, leftTs, rightTs, rightPayload,
      rightTieBreak, payloadPrefix, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       leftTs: String, rightTs: String,
                       rightPayload: Seq[String], rightTieBreak: String,
                       payloadPrefix: String, forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = (rightPayload :+ rightTieBreak).distinct
    // ASOF semantics (l.ts >= r.ts) exclude null-ts rights: nulls-first
    // ordering would otherwise sort a null-ts right row FIRST in its key
    // group and the ignoreNulls carry would hand its payload to left rows
    // with no true predecessor.
    val rTagged = right.where(col(rightTs).isNotNull).select(
      keyCols.map(col) ++ Seq(col(rightTs).as("__ts__"), lit(0).as("__side__"),
        struct(carried.map(col): _*).as("__r__")): _*)
    // pad each side with the other's columns (null) so the union aligns
    val rFull = leftCols.foldLeft(rTagged) { (df, c) =>
      if (keyCols.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val lFull = left
      .withColumn("__ts__", col(leftTs))
      .withColumn("__side__", lit(1))
      .withColumn("__r__", lit(null).cast(rFull.schema("__r__").dataType))
    // side 0 before side 1 at equal ts: a right row AT the left timestamp
    // is already visible to it. Forward traverses time DESCENDING with
    // null-ts lefts explicitly FIRST (desc defaults to nulls-last, which
    // would hand them the globally-earliest right — null ts must match
    // nothing, as the ascending traversal gets free from nulls-first).
    val tsOrder = if (forward) col("__ts__").desc_nulls_first else col("__ts__").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col("__side__"), col("__r__").getField(rightTieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // SQL equi-join semantics: a NULL key matches nothing. Window
    // partitioning groups nulls together, so the carry must be masked —
    // the left row still appears (left-join shape) with a null payload,
    // matching DuckDB's ASOF JOIN ON l.k = r.k.
    val keysNonNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    lFull.unionByName(rFull.select(lFull.columns.toIndexedSeq.map(col): _*))
      .withColumn("__carry__",
        when(keysNonNull, last(col("__r__"), ignoreNulls = true).over(w)))
      .where(col("__side__") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("__carry__").getField(c).as(s"$payloadPrefix$c")): _*)
  }

  /** [[asofJoin]] with a two-level (key, ts-bucket) carry for hot keys.
    *
    * The plain as-of window partitions by `keyCols` only, so ONE key group =
    * ONE sorted task: a power-law key (one user with 10M events) serializes.
    * This variant runs the classic parallel prefix scan instead:
    *
    *   1. per (key, bucket): the latest right row, via one `max_by`
    *      aggregation (distributed on the composite key);
    *   2. per key over BUCKET SUMMARIES: the carry-in for each bucket = the
    *      latest right row of any earlier bucket (`last ignoreNulls` over a
    *      window whose partitions hold one row per bucket — a 10M-event key
    *      at 1k buckets is a 1k-row partition, not a 10M-row one);
    *   3. per (key, bucket): union carry-in + rights + lefts, sort, carry —
    *      the hot key's rows now spread across its buckets.
    *
    * `bucket` must be MONOTONE non-decreasing in the timestamp (e.g.
    * `date_trunc("hour", _)` or `floor(unix_ts / width)`); monotonicity is
    * what makes "latest right of an earlier bucket" ≤ "any right in this
    * bucket" and keeps the three-way merge correct. Semantics are identical
    * to [[asofJoin]] (inclusive at equal ts, greatest-tiebreak, null keys
    * and null left timestamps match nothing). Cost vs the plain form: one
    * extra aggregation + one small window — only worth it when key
    * cardinality is low or skewed; the plain form is the right default.
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       leftTs: String, rightTs: String,
                       rightPayload: Seq[String], rightTieBreak: String,
                       bucket: Column => Column,
                       payloadPrefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = (rightPayload :+ rightTieBreak).distinct
    val keysNonNull = keyCols.map(col(_).isNotNull).reduce(_ && _)

    // Right core: null-ts rights match nothing (ASOF l.ts >= r.ts), and
    // null-KEY rights can never deliver a payload under equi-join
    // semantics — dropping them here keeps them out of the null-key
    // partitions entirely (no masking needed downstream).
    val rCore = right.where(col(rightTs).isNotNull && keysNonNull).select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts__"),
        bucket(col(rightTs)).as("__bkt__"),
        struct(carried.map(col): _*).as("__r__")): _*)
    val rType = rCore.schema("__r__").dataType

    // (1) latest right per (key, bucket): max over the (ts, tiebreak) order,
    // matching the plain form's last-row-wins-greatest-tiebreak semantics.
    val bucketLast = rCore
      .groupBy((keyCols :+ "__bkt__").map(col): _*)
      .agg(max_by(col("__r__"),
        struct(col("__ts__"), col("__r__").getField(rightTieBreak))).as("__last__"))

    // (2) carry-in per bucket over bucket SUMMARIES. The bucket domain is
    // both sides' buckets: a left row in a right-free bucket still needs the
    // carry-in from earlier buckets. A null left ts yields a null bucket,
    // which sorts first → its carry-in is null → matches nothing (correct).
    val lBuckets = left.select(
      keyCols.map(col) :+ bucket(col(leftTs)).as("__bkt__"): _*).distinct()
    val allBuckets = lBuckets
      .union(bucketLast.select((keyCols :+ "__bkt__").map(col): _*))
      .distinct()
    val wCarry = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__bkt__"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = allBuckets
      .join(bucketLast, keyCols :+ "__bkt__", "left")
      .withColumn("__r__", last(col("__last__"), ignoreNulls = true).over(wCarry))
      .drop("__last__")

    // (3) three-way merge inside each (key, bucket): the carry-in row sorts
    // first (__ord__ 0), then rights before lefts at equal ts (inclusive).
    def padLeft(df: DataFrame): DataFrame = leftCols.foldLeft(df) { (d, c) =>
      if (keyCols.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val carryRows = padLeft(carryIn)
      .withColumn("__ts__", lit(null).cast(rCore.schema("__ts__").dataType))
      .withColumn("__ord__", lit(0)).withColumn("__side__", lit(-1))
    val rightRows = padLeft(rCore)
      .withColumn("__ord__", lit(1)).withColumn("__side__", lit(0))
    val leftRows = left
      .withColumn("__ts__", col(leftTs))
      .withColumn("__bkt__", bucket(col(leftTs)))
      .withColumn("__ord__", lit(1)).withColumn("__side__", lit(1))
      .withColumn("__r__", lit(null).cast(rType))
    val w = Window.partitionBy((keyCols :+ "__bkt__").map(col): _*)
      .orderBy(col("__ord__"), col("__ts__"), col("__side__"),
        col("__r__").getField(rightTieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftRows
      .unionByName(rightRows.select(leftRows.columns.toIndexedSeq.map(col): _*))
      .unionByName(carryRows.select(leftRows.columns.toIndexedSeq.map(col): _*))
      .withColumn("__carry__", last(col("__r__"), ignoreNulls = true).over(w))
      .where(col("__side__") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("__carry__").getField(c).as(s"$payloadPrefix$c")): _*)
  }
}
