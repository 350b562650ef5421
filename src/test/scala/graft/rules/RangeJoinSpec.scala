package graft.rules

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("rangeJoin pairs points with containing intervals, once each, per key") {
    val intervals = Seq(
      (1L, "A", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:30:00")), // 3 buckets at 1h grain
      (2L, "A", ts("2024-01-01 20:00:00"), ts("2024-01-01 20:30:00")),
      (3L, "B", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("iv_id", "k", "start_t", "end_t")
    val points = Seq(
      (10L, "A", ts("2024-01-01 10:00:00")), // inclusive start
      (11L, "A", ts("2024-01-01 12:30:00")), // inclusive end, bucket 12
      (12L, "A", ts("2024-01-01 12:31:00")), // just past end, same bucket
      (13L, "A", ts("2024-01-01 20:15:00")),
      (14L, "B", ts("2024-01-01 10:30:00")), // key B only matches interval 3
      (15L, "C", ts("2024-01-01 10:30:00"))  // no interval for key C
    ).toDF("pt_id", "k", "t")
    val out = RangeJoin.rangeJoin(intervals, points, Seq("k"),
        "start_t", "end_t", "t", grainSeconds = 3600)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSeq
    // exactly-once pairing even though interval 1 spans 3 buckets
    assert(out.size == out.distinct.size)
    assert(out.toSet == Set((1L, 10L), (1L, 11L), (2L, 13L), (3L, 14L)))
  }

  test("rangeJoin plans an equi-join on (key, bucket), not a nested loop") {
    val intervals = Seq((1L, "A", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iv_id", "k", "start_t", "end_t")
    val points = Seq((10L, "A", ts("2024-01-01 10:30:00"))).toDF("pt_id", "k", "t")
    val p = RangeJoin.rangeJoin(intervals, points, Seq("k"),
      "start_t", "end_t", "t", 3600).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("overlapJoin pairs overlapping intervals exactly once across shared buckets") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    // a long left interval spanning many 10-min grain buckets against
    // several rights: multi-bucket co-occupancy must still emit ONE row
    val lefts = Seq((1L, "k", t(0), t(95))).toDF("lid", "k", "ls", "le")
    val rights = Seq(
      (10L, "k", t(30), t(40)),   // inside -> overlap (shares 2 buckets)
      (11L, "k", t(90), t(120)),  // tail overlap
      (12L, "k", t(96), t(100)),  // starts after L ends -> none
      (13L, "x", t(30), t(40))    // other key -> none
    ).toDF("rid", "k", "rs", "re")
    val got = RangeJoin.overlapJoin(lefts, rights, Seq("k"),
        "ls", "le", "rs", "re", grainSeconds = 600L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L), (1L, 11L))) // exactly once each
    // inclusive boundary: touching endpoints overlap
    val touch = RangeJoin.overlapJoin(
        Seq((1L, "k", t(0), t(10))).toDF("lid", "k", "ls", "le"),
        Seq((20L, "k", t(10), t(20))).toDF("rid", "k", "rs", "re"),
        Seq("k"), "ls", "le", "rs", "re", 600L)
      .count()
    assert(touch == 1L)
  }

  test("overlapJoin drops inverted intervals: an empty range overlaps nothing") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    // inverted left (end < start) inside a wide right: without the guard,
    // sequence() descends and the pair leaks through the bucket join
    val lefts = Seq((1L, "k", t(50), t(20)), (2L, "k", t(30), t(40)))
      .toDF("lid", "k", "ls", "le")
    val rights = Seq((10L, "k", t(0), t(95)), (11L, "k", t(95), t(20)))
      .toDF("rid", "k", "rs", "re")
    val got = RangeJoin.overlapJoin(lefts, rights, Seq("k"),
        "ls", "le", "rs", "re", grainSeconds = 600L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((2L, 10L))) // only the well-formed pair survives
  }
}
