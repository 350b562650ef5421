package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization: per-key bucket counts with GAP FILLING —
  * every bucket between a key's first and last event exists in the
  * output, empty ones as explicit zeros. Windowed models, rate baselines
  * and the spike detector's batch twin all need the zero rows a plain
  * groupBy never produces (an absent row and a zero are different facts).
  *
  * Scale shape: one (key, bucket) partial-aggregated count, one per-key
  * min/max aggregate over the ALREADY-AGGREGATED frame (rows = occupied
  * buckets, not events), then a per-key `sequence` generator joined back
  * on (key, bucket). The generator fan-out is the key's bucket SPAN —
  * size `bucketSec` so span stays sane (hours over months, not seconds
  * over years); the explode is a narrow stage either way.
  */
object Resample {

  def gapFilledCounts(events: DataFrame, tsCol: String, keyCol: String,
                      bucketSec: Long): DataFrame = {
    require(bucketSec > 0)
    // floor, not cast-truncation: `/` is double division and cast("long")
    // truncates toward zero, which shifts every pre-1970 (negative-epoch)
    // bucket up by one against the documented floor semantics
    val b = floor(col(tsCol).cast("long") / bucketSec).cast("long")
    val counts = events
      .select(col(keyCol), b.as("__b__"))
      .groupBy(col(keyCol), col("__b__")).agg(count(lit(1)).as("cnt"))
    val filled = counts
      .groupBy(col(keyCol)).agg(min(col("__b__")).as("__mn__"), max(col("__b__")).as("__mx__"))
      .select(col(keyCol), explode(sequence(col("__mn__"), col("__mx__"))).as("__b__"))
    filled.join(counts, Seq(keyCol, "__b__"), "left")
      .select(col(keyCol), (col("__b__") * bucketSec).as("bucket_start_sec"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Batch spike detection over the gap-filled series: each bucket
    * compared against its trailing `trailing`-bucket baseline, spike when
    * cnt > (ratioNum/ratioDen) x trailing mean — evaluated as the integer
    * cross-product cnt*tn*den > num*tsum, so the flag is exact and
    * engine-replicable (no float mean). Gap filling is what makes the
    * baseline honest: without explicit zeros a burst after silence would
    * compare against an inflated mean of only-nonzero buckets.
    *
    * Scale shape: [[gapFilledCounts]] + one bounded-frame window per key
    * ordered by bucket — state is the trailing frame, partitioned by key.
    */
  def rollingSpikes(events: DataFrame, tsCol: String, keyCol: String,
                    bucketSec: Long, trailing: Int = 6,
                    ratioNum: Int = 3, ratioDen: Int = 1): DataFrame = {
    require(trailing > 0 && ratioNum > 0 && ratioDen > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket_start_sec"))
      .rowsBetween(-trailing, -1)
    gapFilledCounts(events, tsCol, keyCol, bucketSec)
      .withColumn("trailing_sum", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("trailing_n", count(lit(1)).over(w))
      .withColumn("is_spike",
        col("trailing_n") > 0 &&
          col("cnt") * col("trailing_n") * ratioDen > lit(ratioNum.toLong) * col("trailing_sum"))
  }

  /** Ordered FUNNEL: how far each user progresses through `stages`, where
    * stage i+1 must occur strictly AFTER the user's first completion of
    * stage i (a purchase before the first view does not count a view →
    * purchase conversion). Returns every user seen with the count of
    * stages completed in order.
    *
    * Scale shape: one keyed min-aggregate per stage over rows already
    * filtered to that stage's type, chained through |stages| broadcast-or-
    * hash joins on the user key — never a per-user event sort, never a
    * window over event history. |stages| is a constant (3-5), so this is
    * a fixed-depth keyed-join plan at any corpus size.
    */
  def funnel(events: DataFrame, tsCol: String, userCol: String,
             typeCol: String, stages: Seq[String],
             withinSec: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty)
    require(withinSec.forall(_ > 0))
    val users = events.select(col(userCol)).distinct()
    var acc = users.withColumn("__prev__", lit(null).cast("timestamp"))
      .withColumn("stages_completed", lit(0L))
    stages.zipWithIndex.foreach { case (s, i) =>
      val stageEvents = events.where(col(typeCol) === s)
        .select(col(userCol), col(tsCol).as("__ts__"))
      // candidate = this stage's events, but ONLY for users whose funnel
      // is exactly at stage i, and only events after their stage-i entry
      // (the null-prev first stage accepts any); with an attribution
      // window, also no later than prev + withinSec — a conversion
      // outside the window does not count (and, the funnel being
      // first-completion-anchored, cannot be rescued by a later retry of
      // the EARLIER stage: the anchor is the first completion).
      // Nullifying instead of filtering keeps every user in the aggregate.
      val ordered =
        if (i == 0) lit(true)
        else withinSec match {
          case None => col("__ts__") > col("__prev__")
          case Some(w) => col("__ts__") > col("__prev__") &&
            col("__ts__").cast("long") <= col("__prev__").cast("long") + w
        }
      acc = acc.join(stageEvents, Seq(userCol), "left")
        .withColumn("__cand__",
          when(col("stages_completed") === i && ordered, col("__ts__")))
        .groupBy(col(userCol), col("__prev__"), col("stages_completed"))
        .agg(min(col("__cand__")).as("__next__"))
        .select(col(userCol),
          coalesce(col("__next__"), col("__prev__")).as("__prev__"),
          (col("stages_completed") +
            when(col("__next__").isNotNull, 1L).otherwise(0L)).as("stages_completed"))
    }
    acc.select(col(userCol), col("stages_completed"))
  }

  /** Cohort RETENTION: users grouped by first-seen day, counted as
    * retained on each of the following `horizonDays` days they are active
    * again. Output (cohort_day_sec, day_offset, n_users) — day_offset 0
    * is the cohort's own size.
    *
    * Scale shape: distinct (user, day) activity — a partial-aggregated
    * projection of the raw events — then a per-user min for cohorts and
    * one keyed join back; counts are per (cohort, offset), a tiny frame.
    */
  def retention(events: DataFrame, tsCol: String, userCol: String,
                horizonDays: Int = 7): DataFrame = {
    require(horizonDays >= 0)
    // floor for the same negative-epoch reason as [[gapFilledCounts]]
    val day = floor(col(tsCol).cast("long") / 86400L).cast("long")
    val active = events.select(col(userCol), day.as("__day__")).distinct()
    val cohorts = active.groupBy(col(userCol)).agg(min(col("__day__")).as("__cohort__"))
    active.join(cohorts, Seq(userCol))
      .where(col("__day__") - col("__cohort__") <= horizonDays)
      .groupBy((col("__cohort__") * 86400L).as("cohort_day_sec"),
        (col("__day__") - col("__cohort__")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
