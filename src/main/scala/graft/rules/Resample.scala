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
    val b = (col(tsCol).cast("long") / bucketSec).cast("long")
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
}
