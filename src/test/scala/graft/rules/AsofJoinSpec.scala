package graft.rules

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left row per key") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:05:00")),
      (2L, "A", ts("2024-01-01 10:00:00")), // exactly at a quote: inclusive
      (3L, "A", ts("2024-01-01 09:00:00")), // before any quote: nulls
      (4L, "B", ts("2024-01-01 10:30:00"))
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, "A", ts("2024-01-01 10:00:00"), 100.0),
      (11L, "A", ts("2024-01-01 10:04:00"), 101.0),
      (12L, "B", ts("2024-01-01 10:00:00"), 50.0),
      (13L, "B", ts("2024-01-01 11:00:00"), 51.0) // after the trade: invisible
    ).toDF("quote_id", "sym", "t", "px")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t",
        rightPayload = Seq("quote_id", "px"), rightTieBreak = "quote_id")
      .select("trade_id", "asof_quote_id", "asof_px")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(11L), Some(101.0))))
    assert(out(2L) == ((Some(10L), Some(100.0)))) // inclusive at equal ts
    assert(out(3L) == ((None, None)))             // nothing before it
    assert(out(4L) == ((Some(12L), Some(50.0))))
  }

  test("asofJoinForward picks the earliest right row at-or-after each left row") {
    val events = Seq(
      (1L, "A", ts("2024-01-01 10:05:00")),
      (2L, "A", ts("2024-01-01 10:00:00")), // exactly at a slot: inclusive
      (3L, "A", ts("2024-01-01 11:00:00")), // after every slot: nulls
      (4L, "B", ts("2024-01-01 09:00:00"))
    ).toDF("ev_id", "sym", "t")
    val slots = Seq(
      (10L, "A", ts("2024-01-01 10:00:00"), 100.0),
      (11L, "A", ts("2024-01-01 10:30:00"), 101.0),
      (12L, "B", ts("2024-01-01 08:00:00"), 50.0), // before the event: invisible
      (13L, "B", ts("2024-01-01 09:30:00"), 51.0)
    ).toDF("slot_id", "sym", "t", "px")
    val out = AsofJoin.asofJoinForward(events, slots, Seq("sym"), "t", "t",
        rightPayload = Seq("slot_id", "px"), rightTieBreak = "slot_id")
      .select("ev_id", "asof_slot_id", "asof_px")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(11L), Some(101.0)))) // next slot after 10:05
    assert(out(2L) == ((Some(10L), Some(100.0)))) // inclusive at equal ts
    assert(out(3L) == ((None, None)))             // nothing after it
    assert(out(4L) == ((Some(13L), Some(51.0))))
    // null left ts matches nothing under the descending traversal too
    val nullTs = Seq((5L, "A", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("ev_id", "sym", "t")
    val got = AsofJoin.asofJoinForward(nullTs, slots, Seq("sym"), "t", "t",
        Seq("slot_id"), "slot_id")
      .select("asof_slot_id").as[Option[Long]].head()
    assert(got.isEmpty)
  }

  test("a null payload field never splices values from different right rows") {
    val left = Seq((1L, "A", ts("2024-01-01 12:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (20L, "A", ts("2024-01-01 10:00:00"), Option(5.0)),
      (21L, "A", ts("2024-01-01 11:00:00"), Option.empty[Double]) // latest, null px
    ).toDF("rid", "k", "t", "px")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t",
        rightPayload = Seq("rid", "px"), rightTieBreak = "rid")
      .select("asof_rid", "asof_px").as[(Option[Long], Option[Double])].head()
    assert(out == ((Some(21L), None))) // row 21's null px, NOT row 20's 5.0
  }

  test("null join keys match nothing (SQL equi-join semantics)") {
    val left = Seq(
      (1L, Option("A"), ts("2024-01-01 12:00:00")),
      (2L, Option.empty[String], ts("2024-01-01 12:00:00"))
    ).toDF("id", "k", "t")
    val right = Seq(
      (40L, Option("A"), ts("2024-01-01 10:00:00"), 1.0),
      (41L, Option.empty[String], ts("2024-01-01 10:00:00"), 2.0)
    ).toDF("rid", "k", "t", "px")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t",
        rightPayload = Seq("rid"), rightTieBreak = "rid")
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(40L))
    assert(out(2L).isEmpty) // null key left row appears, but carries nothing
  }

  test("a null right timestamp matches nothing (ASOF l.ts >= r.ts)") {
    val left = Seq((1L, "A", ts("2024-01-01 09:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (50L, "A", Option.empty[java.sql.Timestamp], 9.0), // null ts: invisible
      (51L, "A", Option(ts("2024-01-01 10:00:00")), 1.0) // after the left row
    ).toDF("rid", "k", "t", "px")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t",
        rightPayload = Seq("rid", "px"), rightTieBreak = "rid")
      .select("asof_rid").as[Option[Long]].head()
    assert(out.isEmpty) // the null-ts right row must NOT be carried
  }

  test("bucketed as-of matches the plain form on a deliberately hot key") {
    // ONE key holding every row — the case where the plain form serializes
    // into a single sorted task and the bucketed form spreads over buckets.
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    def someTs(i: Int): Option[java.sql.Timestamp] =
      if (i % 97 == 0) None else Some(new java.sql.Timestamp(base + rnd.nextInt(36000) * 1000L))
    // includes null keys and null timestamps on both sides so the
    // equivalence also covers the masking/exclusion rules
    val lefts = (1 to 400).map { i =>
      (i.toLong, if (i % 89 == 0) None else Some("hot"), someTs(i))
    }.toDF("id", "k", "t")
    val rights = (1 to 400).map { i =>
      (1000L + i, if (i % 83 == 0) None else Some("hot"), someTs(i), rnd.nextDouble())
    }.toDF("rid", "k", "t", "px")
    val plain = AsofJoin.asofJoin(lefts, rights, Seq("k"), "t", "t",
      rightPayload = Seq("rid", "px"), rightTieBreak = "rid")
    val bucketed = AsofJoin.asofJoinBucketed(lefts, rights, Seq("k"), "t", "t",
      rightPayload = Seq("rid", "px"), rightTieBreak = "rid",
      bucket = c => date_trunc("hour", c))
    assert(rows(bucketed) == rows(plain))
    assert(plain.count() == 400)
    // the merge window partitions on (key, bucket) — the hot key's rows are
    // NOT all in one window partition
    val winSpecs = bucketed.queryExecution.executedPlan.toString()
      .linesIterator.filter(_.contains("windowspecdefinition")).mkString("\n")
    assert(winSpecs.contains("__bkt__"))
  }

  test("bucketed as-of carries across right-free buckets and edge cases") {
    val lefts = Seq(
      (1L, "A", ts("2024-01-01 05:30:00")), // hours 1..4 have no rights
      (2L, "A", ts("2024-01-01 00:10:00")), // before any right: null
      (3L, "B", ts("2024-01-01 05:30:00"))  // other key unaffected
    ).toDF("id", "k", "t")
    val rights = Seq(
      (10L, "A", ts("2024-01-01 00:20:00"), 1.0),
      (11L, "A", ts("2024-01-01 00:40:00"), 2.0), // latest before hour 5
      (12L, "B", ts("2024-01-01 05:00:00"), 3.0)
    ).toDF("rid", "k", "t", "px")
    val out = AsofJoin.asofJoinBucketed(lefts, rights, Seq("k"), "t", "t",
        rightPayload = Seq("rid", "px"), rightTieBreak = "rid",
        bucket = c => date_trunc("hour", c))
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(11L)) // carry-in across 4 empty hour buckets
    assert(out(2L).isEmpty)
    assert(out(3L).contains(12L))
  }

  test("equal right timestamps resolve to the greatest tiebreak deterministically") {
    val left = Seq((1L, "A", ts("2024-01-01 12:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (30L, "A", ts("2024-01-01 10:00:00"), 1.0),
      (31L, "A", ts("2024-01-01 10:00:00"), 2.0)
    ).toDF("rid", "k", "t", "px")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t",
        rightPayload = Seq("rid", "px"), rightTieBreak = "rid")
      .select("asof_rid").as[Long].head()
    assert(out == 31L)
  }
}
