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
