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

  test("rollingSpikes flags only bursts above the trailing baseline") {
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hours 10..12: 1 event each; hour 13: 10 events (spike); hour 14: 1
    val events = (Seq(t(10, 0), t(11, 0), t(12, 0)) ++
      (0 until 10).map(m => t(13, m)) :+ t(14, 0)).map((_, "a")).toDF("ts", "k")
    val out = Resample.rollingSpikes(events, "ts", "k", 3600L)
      .select("bucket_start_sec", "cnt", "is_spike")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 1L, 1L, 10L, 1L))
    assert(out.map(_._3).toSeq == Seq(false, false, false, true, false))
    // the first bucket has no baseline (trailing_n = 0): never a spike
  }

  test("funnel requires stage order: purchase before first view does not count") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      (1L, t(0), "signup"), (1L, t(1), "view"), (1L, t(2), "purchase"), // full funnel
      (2L, t(0), "signup"), (2L, t(2), "view"), (2L, t(1), "purchase"), // purchase BEFORE view
      (3L, t(5), "view"), (3L, t(6), "purchase"),                       // no signup at all
      (4L, t(0), "signup"),                                             // stops at signup
      (5L, t(0), "click")                                               // never enters
    ).toDF("user_id", "ts", "event_type")
    val got = Resample.funnel(events, "ts", "user_id", "event_type",
      Seq("signup", "view", "purchase")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("funnel attribution window: conversions outside withinSec do not count") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    val events = Seq(
      (1L, t(0), "signup"), (1L, t(10), "view"),   // inside 30 min
      (2L, t(0), "signup"), (2L, t(45), "view")    // outside
    ).toDF("user_id", "ts", "event_type")
    val got = Resample.funnel(events, "ts", "user_id", "event_type",
      Seq("signup", "view"), withinSec = Some(1800L)).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
    // boundary: exactly +1800s counts (<=)
    val edge = Seq((3L, t(0), "signup"), (3L, t(30), "view"))
      .toDF("user_id", "ts", "event_type")
    val gotEdge = Resample.funnel(edge, "ts", "user_id", "event_type",
      Seq("signup", "view"), withinSec = Some(1800L)).as[(Long, Long)].collect().toMap
    assert(gotEdge == Map(3L -> 2L))
  }

  test("retention counts cohort users active at each day offset") {
    def d(day: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d $h%02d:00:00")
    val events = Seq(
      (1L, d(1, 10)), (1L, d(2, 10)), (1L, d(2, 15)), (1L, d(4, 10)), // day0,1,3
      (2L, d(1, 11)),                                                  // day0 only
      (3L, d(2, 9)), (3L, d(12, 9))                                    // day0 + beyond horizon
    ).toDF("user_id", "ts")
    val got = Resample.retention(events, "ts", "user_id", 7)
      .as[(Long, Long, Long)].collect().toSet
    val c1 = d(1, 0).getTime / 1000 / 86400 * 86400
    val c2 = d(2, 0).getTime / 1000 / 86400 * 86400
    assert(got == Set(
      (c1, 0L, 2L), (c1, 1L, 1L), (c1, 3L, 1L), // users 1+2 on day0; user 1 later
      (c2, 0L, 1L)))                            // user 3's day-10 visit is past horizon
  }

  test("pre-1970 timestamps bucket by floor, not truncation toward zero") {
    // epoch -1800 s (1969-12-31 23:30 UTC) belongs to hour-bucket -1
    // ([-3600, 0)); cast-truncation would put it in bucket 0
    val events = Seq(Tuple2(new java.sql.Timestamp(-1800L * 1000), "a"))
      .toDF("ts", "k")
    val out = Resample.gapFilledCounts(events, "ts", "k", 3600L)
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a", -3600L, 1L)))
    // retention day for the same instant is day -1, not day 0
    val r = Resample.retention(events.toDF("ts", "user"), "ts", "user", 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((-86400L, 0L, 1L)))
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
