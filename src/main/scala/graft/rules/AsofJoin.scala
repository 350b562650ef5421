package graft.rules

import org.apache.spark.sql.DataFrame
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
               payloadPrefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = (rightPayload :+ rightTieBreak).distinct
    val rTagged = right.select(
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
    // is already visible to it
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts__"), col("__side__"), col("__r__").getField(rightTieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // SQL equi-join semantics: a NULL key matches nothing. Window
    // partitioning groups nulls together, so the carry must be masked —
    // the left row still appears (left-join shape) with a null payload,
    // matching DuckDB's ASOF JOIN ON l.k = r.k.
    val keysNonNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    lFull.unionByName(rFull.select(lFull.columns.map(col): _*))
      .withColumn("__carry__",
        when(keysNonNull, last(col("__r__"), ignoreNulls = true).over(w)))
      .where(col("__side__") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("__carry__").getField(c).as(s"$payloadPrefix$c")): _*)
  }
}
