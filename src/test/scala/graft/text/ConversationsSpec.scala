package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConversationsSpec extends SparkSpec {

  import spark.implicits._

  private def conv(id: Long, turns: (String, String)*) =
    (id, turns.map { case (r, c) => (r, c) })

  private def df(rows: (Long, Seq[(String, String)])*) =
    rows.toDF("id", "raw").select(col("id"),
      expr("transform(raw, t -> struct(t._1 AS role, t._2 AS content))").as("turns"))

  test("clean conversations pass; each corruption trips exactly its rule") {
    val out = Conversations.validate(df(
      conv(1L, "user" -> "hi", "assistant" -> "hello"),
      conv(2L, "system" -> "be nice", "user" -> "hi", "assistant" -> "hello"),
      conv(3L, "assistant" -> "hi", "user" -> "??"),          // starts + order + end
      conv(4L, "user" -> "a", "user" -> "b", "assistant" -> "c"), // double user
      conv(5L, "user" -> "a", "assistant" -> " ", "user" -> "b"), // blank + user-final
      conv(6L, "user" -> "a", "assistant" -> "b", "system" -> "late", "user" -> "c")
    ), "id", "turns").collect()
      .map(r => r.getLong(0) -> r).toMap

    def flags(id: Long) = {
      val r = out(id)
      (r.getAs[Boolean]("starts_ok"), r.getAs[Boolean]("alternates_ok"),
        r.getAs[Boolean]("ends_ok"), r.getAs[Boolean]("has_empty_turn"),
        r.getAs[Boolean]("chat_ok"))
    }
    assert(flags(1L) == ((true, true, true, false, true)))
    assert(flags(2L) == ((true, true, true, false, true))) // optional system lead
    assert(flags(3L) == ((false, false, false, false, false)))
    assert(flags(4L) == ((true, false, true, false, false)))
    assert(flags(5L) == ((true, true, false, true, false)))
    assert(flags(6L) == ((true, false, false, false, false))) // mid-conv system
    assert(out(1L).getAs[Long]("n_chars") == 7L)
    assert(out(2L).getAs[String]("last_role") == "assistant")
  }

  test("degenerate shapes: empty array, null array, single turn") {
    val withNull = Seq((7L, Seq.empty[(String, String)]), (9L, Seq(("user", "only")))).toDF("id", "raw")
      .select(col("id"),
        expr("transform(raw, t -> struct(t._1 AS role, t._2 AS content))").as("turns"))
      .unionByName(Seq(Tuple1(8L)).toDF("id").select(col("id"),
        lit(null).cast("array<struct<role:string,content:string>>").as("turns")))
    val out = Conversations.validate(withNull, "id", "turns").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 3) // nothing vanishes through the explode
    assert(out(7L).getAs[Long]("n_turns") == 0L && !out(7L).getAs[Boolean]("chat_ok"))
    assert(out(8L).getAs[Long]("n_turns") == 0L && !out(8L).getAs[Boolean]("chat_ok"))
    // single user turn: well-formed start but too short and user-final
    assert(out(9L).getAs[Long]("n_turns") == 1L && !out(9L).getAs[Boolean]("chat_ok"))
    assert(out(9L).getAs[Boolean]("starts_ok"))
  }

  test("render: template pieces concatenate in turn order; empty renders empty") {
    val out = Conversations.render(df(
      conv(1L, "system" -> "s", "user" -> "q", "assistant" -> "a"),
      conv(2L)), "id", "turns").collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("text") ==
      "<|system|>\ns</s><|user|>\nq</s><|assistant|>\na</s>")
    assert(out(1L).getAs[Long]("n_turns") == 3L)
    assert(out(1L).getAs[Long]("n_chars") == out(1L).getAs[String]("text").length.toLong)
    assert(out(2L).getAs[String]("text") == "" && out(2L).getAs[Long]("n_turns") == 0L)
  }

  test("dedupByPrompt: normalized first-user-turn groups, best-score keeper, promptless singletons") {
    val out = Conversations.dedupByPrompt(df(
      conv(1L, "user" -> "What is Spark?", "assistant" -> "a"),
      conv(2L, "user" -> "  what is spark? ", "assistant" -> "b", "user" -> "more", "assistant" -> "c"),
      conv(3L, "system" -> "s", "user" -> "What is Spark?", "assistant" -> "d"),
      conv(4L, "user" -> "Different prompt", "assistant" -> "e"),
      conv(5L, "system" -> "no user turn at all")
    ), "id", "turns", size(col("turns")).cast("double"))
      .as[(Long, String, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // 1, 2, 3 share the normalized prompt; 2 has the most turns -> keeper
    assert(out(1L) == ((1L, "what is spark?", 3L, false)))
    assert(out(2L) == ((2L, "what is spark?", 3L, true)))
    assert(out(3L) == ((3L, "what is spark?", 3L, false)))
    assert(out(4L) == ((4L, "different prompt", 1L, true)))
    assert(out(5L) == ((5L, null, 1L, true))) // no user turn: own group
  }

  test("lossMaskStats: assistant char mass and floored micro fraction") {
    val out = Conversations.lossMaskStats(df(
      conv(1L, "user" -> "aaaa", "assistant" -> "bb"),   // 2/6 trainable
      conv(2L, "user" -> "only user")), "id", "turns")    // nothing trainable
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, 2L, 6L, 333333L)))
    assert(out(2L) == ((2L, 0L, 0L, 9L, 0L)))
  }

  test("validatePreferencePairs: identical/blank sides are zero-gradient rejects") {
    val out = Conversations.validatePreferencePairs(Seq(
      (1L, "p", "good answer", "bad answer"),
      (2L, "p", "same", "same"),
      (3L, "p", "same", " same "),   // identical after trim
      (4L, " ", "a", "b"),           // blank prompt
      (5L, "p", "", "b")             // blank chosen
    ).toDF("id", "prompt", "chosen", "rejected"),
      "id", "prompt", "chosen", "rejected")
      .select("id", "responses_identical", "pair_ok")
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((false, true)))
    assert(out(2L) == ((true, false)))
    assert(out(3L) == ((true, false)))
    assert(out(4L) == ((false, false)))
    assert(out(5L) == ((false, false)))
  }

  test("redact scrubs PII per turn, preserving roles and order") {
    val out = Conversations.redact(df(
      conv(1L, "user" -> "mail me at bob.j@example.org please",
        "assistant" -> "noted, also 10.0.0.3 pinged",
        "user" -> "clean turn"),
      conv(2L)), "id", "turns").collect().map(r => r.getLong(0) -> r).toMap
    val turns = out(1L).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("turns")
      .map(t => (t.getString(0), t.getString(1))).toSeq
    assert(turns == Seq(
      ("user", "mail me at [EMAIL] please"),
      ("assistant", "noted, also [IP] pinged"),
      ("user", "clean turn")))
    assert(out(1L).getAs[Long]("n_pii_hits") == 2L)
    assert(out(2L).getAs[scala.collection.Seq[Any]]("turns").isEmpty)
    assert(out(2L).getAs[Long]("n_pii_hits") == 0L)
  }

  test("maxTurns budget: an over-long conversation fails chat_ok only on length") {
    val long = (1 to 5).flatMap(i => Seq("user" -> s"q$i", "assistant" -> s"a$i"))
    val out = Conversations.validate(df(conv(1L, long: _*)), "id", "turns", maxTurns = 8)
      .collect().head
    assert(out.getAs[Long]("n_turns") == 10L)
    assert(out.getAs[Boolean]("alternates_ok") && out.getAs[Boolean]("ends_ok"))
    assert(!out.getAs[Boolean]("chat_ok"))
  }
}
