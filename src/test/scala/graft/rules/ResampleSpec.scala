package graft.rules

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {

  import spark.implicits._

  test("gapFilledCounts emits explicit zeros for empty interior buckets") {
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    // key a: events in hours 10 and 13 (gap at 11, 12); key b: one event
    val events = Seq((t(10), "a"), (t(10), "a"), (t(13), "a"), (t(11), "b"))
      .toDF("ts", "k")
    val out = Resample.gapFilledCounts(events, "ts", "k", 3600L)
      .as[(String, Long, Long)].collect().toSet
    val h10 = t(10).getTime / 1000 / 3600 * 3600
    assert(out == Set(
      ("a", h10, 2L), ("a", h10 + 3600, 0L), ("a", h10 + 7200, 0L),
      ("a", h10 + 10800, 1L), ("b", h10 + 3600, 1L)))
    // per-key ranges are independent: b has no rows outside its own span
  }

  test("gapFilledCounts totals match the raw event count") {
    val events = spark.range(0, 500).select(
      (col("id") % 5).cast("string").as("k"),
      timestamp_seconds(lit(1700000000L) + col("id") * 137).as("ts"))
    val out = Resample.gapFilledCounts(events, "ts", "k", 60L)
    assert(out.agg(sum("cnt")).head().getLong(0) == 500L)
    // bucket starts align to the bucket size
    assert(out.where(expr("bucket_start_sec % 60 != 0")).count() == 0)
  }
}
