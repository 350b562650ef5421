package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: pair each right POINT with every left INTERVAL
  * that contains it, per key — "events inside each session window",
  * "readings during each maintenance period".
  *
  * Spark plans a raw `l.start <= r.ts AND r.ts <= l.end` predicate as a
  * broadcast-nested-loop or cartesian theta join — |L|x|R| comparisons per
  * key. This implementation buckets time at a caller-chosen grain instead:
  * each interval explodes into the (few) grain buckets it covers, each
  * point maps to its single bucket, and the join is an EQUI-join on
  * (key, bucket) followed by the exact containment filter — shuffle-
  * partitioned, skew-bounded by bucket occupancy, no quadratic blow-up.
  * An interval spanning k buckets meets a matching point exactly once
  * (the point lives in one bucket), so no dedup pass is needed.
  *
  * `grainSeconds` tunes bucket fan-out: pick it near the typical interval
  * length so intervals explode into O(1) buckets (fan-out =
  * len/grain + 1) while buckets stay small.
  */
object RangeJoin {

  def rangeJoin(intervals: DataFrame, points: DataFrame, keyCols: Seq[String],
                startCol: String, endCol: String, tsCol: String,
                grainSeconds: Long): DataFrame = {
    require(grainSeconds > 0, "grainSeconds must be positive")
    def bucketOf(c: Column): Column = floor(unix_timestamp(c) / grainSeconds)
    val lBucketed = intervals.withColumn("__bucket__",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val rBucketed = points.withColumn("__bucket__", bucketOf(col(tsCol)))
    val joinKeys = keyCols :+ "__bucket__"
    lBucketed.join(rBucketed, joinKeys,  "inner")
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket__")
  }

  /** INTERVAL-OVERLAP join: pair each left interval with every right
    * interval it overlaps per key (inclusive ends — the standard
    * `l.start <= r.end AND r.start <= l.end`): "sessions concurrent with
    * incidents", "bookings clashing with maintenance windows" — genomics'
    * interval-intersection in time.
    *
    * Same bucketing discipline as [[rangeJoin]] with the canonical-bucket
    * trick replacing dedup: both sides explode into their covered grain
    * buckets, but a pair is EMITTED only in the bucket containing
    * max(l.start, r.start) — the first bucket where both intervals are
    * live. Every overlapping pair shares that bucket (both intervals span
    * it) and passes the condition exactly once, so no distinct pass ever
    * touches the matched output; non-overlapping same-bucket pairs die in
    * the exact predicate. Equi-join on (key, bucket), no theta join, no
    * row-pair amplification beyond bucket co-occupancy.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  lStart: String, lEnd: String, rStart: String, rEnd: String,
                  grainSeconds: Long): DataFrame = {
    require(grainSeconds > 0, "grainSeconds must be positive")
    def bucketOf(c: Column): Column = floor(unix_timestamp(c) / grainSeconds)
    // Inverted intervals (end < start) are dropped up front: `sequence`
    // generates a DESCENDING bucket list for them, so a malformed row
    // would still explode and could emit pairs (an inverted left interval
    // "overlaps" any right interval spanning it) instead of matching
    // nothing — the empty-interval reading of an inverted range.
    val lBucketed = left.where(col(lStart) <= col(lEnd)).withColumn("__bucket__",
      explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))))
    val rBucketed = right.where(col(rStart) <= col(rEnd)).withColumn("__bucket__",
      explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))))
    lBucketed.join(rBucketed, keyCols :+ "__bucket__", "inner")
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .where(col("__bucket__") ===
        bucketOf(greatest(col(lStart), col(rStart)))) // canonical: emit once
      .drop("__bucket__")
  }
}
