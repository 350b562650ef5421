package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chat-format (SFT/RLHF) training-record validation: multi-turn
  * conversations arrive as `array<struct<role, content>>` columns, and the
  * curation questions are structural — does the record start with a system
  * or user turn, do user/assistant strictly alternate, does it end on an
  * assistant turn, is any turn blank, how many turns/characters. Records
  * failing the shape rules are the chat-corpus analog of contract
  * rejections; the stats feed per-source mixing budgets.
  *
  * Execution shape (the line-cleaner discipline): turns posexplode, ONE
  * doc-keyed exchange serves both the alternation window and the summary
  * aggregation (turns never leave their conversation), every per-turn
  * check is plain codegen — no interpreted array-HOF lambdas.
  */
object Conversations {

  /** Drive an aggregated per-conversation lane from the FULL input: a
    * null/empty turn array produces no exploded rows, so without this
    * left-join-back such conversations would VANISH from the output
    * instead of surfacing as degenerate records. Every family member
    * routes its final projection through here so none can forget the
    * lesson independently.
    */
  private def driveFromFull(df: DataFrame, idCol: String, agg: DataFrame,
                            outCols: Seq[(String, Column)]): DataFrame =
    df.select(col(idCol).as("__id__")).join(agg, Seq("__id__"), "left")
      .select(col("__id__").as(idCol) +: outCols.map { case (n, c) => c.as(n) }: _*)

  /** Per-conversation shape report over `turnsCol: array<struct<role:string,
    * content:string>>`. Output: (id, n_turns, n_chars, starts_ok,
    * alternates_ok, ends_ok, has_empty_turn, last_role, chat_ok).
    *
    * Rules (the common chat-template contract):
    *  - starts_ok: first role is `system` or `user`;
    *  - alternates_ok: ignoring one optional leading `system`, roles
    *    strictly alternate `user`/`assistant` starting with `user` (an
    *    unknown role, a repeat, or a mid-conversation `system` fails);
    *  - ends_ok: last role is `assistant`;
    *  - has_empty_turn: any null/blank content;
    *  - chat_ok: all of the above and n_turns in [2, maxTurns].
    */
  def validate(df: DataFrame, idCol: String, turnsCol: String,
               maxTurns: Int = 64): DataFrame = {
    val turns = df.select(col(idCol).as("__id__"),
      posexplode(col(turnsCol)).as(Seq("__pos__", "__t__")))
      .select(col("__id__"), col("__pos__"),
        col("__t__.role").as("__role__"), col("__t__.content").as("__content__"))
      .repartition(col("__id__"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id__")).orderBy(col("__pos__"))
    // expected parity: after dropping an optional leading system turn,
    // even offsets are user, odd are assistant
    val flagged = turns
      .withColumn("__first_role__", first(col("__role__")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("__off__",
        col("__pos__") - when(col("__first_role__") === "system", 1).otherwise(0))
      .withColumn("__expected__",
        when(col("__off__") < 0, lit("system"))
          .when(pmod(col("__off__"), lit(2)) === 0, lit("user"))
          .otherwise(lit("assistant")))
      .withColumn("__blank__",
        col("__content__").isNull || trim(col("__content__")) === "")
    val agg = flagged.groupBy(col("__id__")).agg(
      count(lit(1)).as("n_turns"),
      coalesce(sum(length(col("__content__"))), lit(0L)).cast("bigint").as("n_chars"),
      (count(when(col("__pos__") === 0 &&
        col("__role__").isin("system", "user"), 1)) > 0).as("starts_ok"),
      // null-safe <=>: a NULL role must count as a mismatch, not vanish
      // through three-valued logic and leave alternates_ok true
      (count(when(!(col("__role__") <=> col("__expected__")), 1)) === 0).as("alternates_ok"),
      (max(struct(col("__pos__"), col("__role__"))).getField("__role__") === "assistant")
        .as("ends_ok"),
      (count(when(col("__blank__"), 1)) > 0).as("has_empty_turn"),
      max(struct(col("__pos__"), col("__role__"))).getField("__role__").as("last_role"))
      .withColumn("chat_ok",
        col("starts_ok") && col("alternates_ok") && col("ends_ok") &&
          !col("has_empty_turn") &&
          col("n_turns") >= 2 && col("n_turns") <= maxTurns)
    driveFromFull(df, idCol, agg, Seq(
      "n_turns" -> coalesce(col("n_turns"), lit(0L)).cast("bigint"),
      "n_chars" -> coalesce(col("n_chars"), lit(0L)).cast("bigint"),
      "starts_ok" -> coalesce(col("starts_ok"), lit(false)),
      "alternates_ok" -> coalesce(col("alternates_ok"), lit(false)),
      "ends_ok" -> coalesce(col("ends_ok"), lit(false)),
      "has_empty_turn" -> coalesce(col("has_empty_turn"), lit(false)),
      "last_role" -> col("last_role"),
      "chat_ok" -> coalesce(col("chat_ok"), lit(false))))
  }

  /** Render each conversation to ONE training string — `<|role|>\n` +
    * content + `eos` per turn, concatenated in order (the public
    * zephyr-style chat template) — plus the turn/char accounting a packer
    * consumes. A null/empty conversation renders as the empty string.
    * Same single doc-keyed exchange as [[validate]].
    */
  def render(df: DataFrame, idCol: String, turnsCol: String,
             eos: String = "</s>"): DataFrame = {
    val turns = df.select(col(idCol).as("__id__"),
      posexplode(col(turnsCol)).as(Seq("__pos__", "__t__")))
      .select(col("__id__"), col("__pos__"),
        concat(lit("<|"), col("__t__.role"), lit("|>\n"),
          coalesce(col("__t__.content"), lit("")), lit(eos)).as("__r__"))
      .repartition(col("__id__"))
    val agg = turns.groupBy(col("__id__")).agg(
      count(lit(1)).as("n_turns"),
      concat_ws("", sort_array(collect_list(struct(col("__pos__"), col("__r__"))))
        .getField("__r__")).as("text"))
    driveFromFull(df, idCol, agg, Seq(
      "text" -> coalesce(col("text"), lit("")),
      "n_turns" -> coalesce(col("n_turns"), lit(0L)).cast("bigint"),
      "n_chars" -> length(coalesce(col("text"), lit(""))).cast("bigint")))
  }

  /** Loss-mask accounting: SFT training masks the loss to ASSISTANT tokens,
    * so the per-record trainable fraction — assistant characters over all
    * content characters — is the budget number a mixing step weighs
    * (a conversation that is 95% user paste trains almost nothing).
    * Fractions in floored integer micro-units. Pure per-turn codegen + one
    * doc-keyed aggregation; drives from the full input like [[validate]].
    */
  def lossMaskStats(df: DataFrame, idCol: String, turnsCol: String): DataFrame = {
    val turns = df.select(col(idCol).as("__id__"),
      explode(col(turnsCol)).as("__t__"))
      .select(col("__id__"), col("__t__.role").as("__role__"),
        coalesce(length(col("__t__.content")), lit(0)).as("__len__"))
    val agg = turns.groupBy(col("__id__")).agg(
      count(when(col("__role__") === "assistant", 1)).as("n_assistant_turns"),
      coalesce(sum(when(col("__role__") === "assistant", col("__len__"))), lit(0L))
        .as("assistant_chars"),
      sum(col("__len__")).as("total_chars"))
    driveFromFull(df, idCol, agg, Seq(
      "n_assistant_turns" -> coalesce(col("n_assistant_turns"), lit(0L)).cast("bigint"),
      "assistant_chars" -> coalesce(col("assistant_chars"), lit(0L)).cast("bigint"),
      "total_chars" -> coalesce(col("total_chars"), lit(0L)).cast("bigint"),
      "assistant_frac_micro" -> when(coalesce(col("total_chars"), lit(0L)) === 0, 0L)
        .otherwise(floor(coalesce(col("assistant_chars"), lit(0L)).cast("double")
          * 1000000.0 / col("total_chars").cast("double")).cast("bigint"))))
  }

  /** Preference-pair (DPO/RLHF) record validation: a pair is trainable only
    * if both responses are non-blank AND differ — identical or blank sides
    * give a zero-gradient comparison. Emits the per-side lengths the
    * length-bias audits consume. Pure per-row codegen, no shuffle.
    */
  def validatePreferencePairs(df: DataFrame, idCol: String, promptCol: String,
                              chosenCol: String, rejectedCol: String): DataFrame = {
    val blank = (c: Column) => c.isNull || trim(c) === ""
    val chosen = col(chosenCol)
    val rejected = col(rejectedCol)
    df.select(col(idCol),
      blank(col(promptCol)).as("prompt_blank"),
      blank(chosen).as("chosen_blank"),
      blank(rejected).as("rejected_blank"),
      (!blank(chosen) && !blank(rejected) && trim(chosen) === trim(rejected))
        .as("responses_identical"),
      coalesce(length(chosen), lit(0)).cast("bigint").as("chosen_chars"),
      coalesce(length(rejected), lit(0)).cast("bigint").as("rejected_chars"),
      (!blank(col(promptCol)) && !blank(chosen) && !blank(rejected) &&
        trim(chosen) =!= trim(rejected)).as("pair_ok"))
  }

  /** Per-turn PII redaction: every turn's content passes through the
    * [[TextStats.piiRedactColumns]] ordered replace chain (email / IPv4 /
    * NHS number / long-id runs), and the conversation reassembles with
    * roles and order intact — chat corpora carry pasted user PII more
    * often than web text does, and redaction must not disturb the turn
    * structure the trainer consumes. `n_pii_hits` totals the per-category
    * matches for the audit trail. The rebuilt array comes from
    * `arrays_zip` over the sorted collection (no interpreted HOF lambdas).
    */
  def redact(df: DataFrame, idCol: String, turnsCol: String): DataFrame = {
    val turns = df.select(col(idCol).as("__id__"),
      posexplode(col(turnsCol)).as(Seq("__pos__", "__t__")))
      .select(col("__id__"), col("__pos__"),
        col("__t__.role").as("__role__"), col("__t__.content").as("__content__"))
      .repartition(col("__id__"))
    val pii = TextStats.piiRedactColumns(col("__content__")).toMap
    val flagged = turns.select(col("__id__"), col("__pos__"), col("__role__"),
      pii("redacted").as("__red__"),
      (pii("n_emails") + pii("n_ipv4") + pii("n_nhs_numbers") + pii("n_long_ids"))
        .as("__hits__"))
    val agg = flagged.groupBy(col("__id__")).agg(
      sort_array(collect_list(struct(col("__pos__"), col("__role__"), col("__red__"))))
        .as("__sorted__"),
      sum(col("__hits__")).as("n_pii_hits"))
      .select(col("__id__"),
        arrays_zip(col("__sorted__").getField("__role__").as("role"),
          col("__sorted__").getField("__red__").as("content")).as("turns"),
        col("n_pii_hits"))
    driveFromFull(df, idCol, agg, Seq(
      "turns" -> coalesce(col("turns"),
        array().cast("array<struct<role:string,content:string>>")),
      "n_pii_hits" -> coalesce(col("n_pii_hits"), lit(0L)).cast("bigint")))
  }

  /** PROMPT-level dedup (SFT curation: many sampled answers to the same
    * instruction — keep the best): conversations group on the normalized
    * (lower + trim) content of their FIRST user turn; `keep` marks the
    * group's `score` argmax (tie: minimum id). Conversations with no user
    * turn are their own singleton groups (never glued through a shared
    * null key). Output: (id, prompt_norm, group_size, keep).
    */
  def dedupByPrompt(df: DataFrame, idCol: String, turnsCol: String,
                    score: Column): DataFrame = {
    val base = df.select(col(idCol).as("__id__"), col(turnsCol).as("__turns__"),
      score.as("__score__"))
    val firstUser = base
      .select(col("__id__"), posexplode(col("__turns__")).as(Seq("__pos__", "__t__")))
      .where(col("__t__.role") === "user")
      .groupBy(col("__id__"))
      .agg(min(struct(col("__pos__"), col("__t__.content").as("__c__")))
        .getField("__c__").as("__prompt__"))
      .select(col("__id__"), lower(trim(col("__prompt__"))).as("prompt_norm"))
    val joined = base.join(firstUser, Seq("__id__"), "left")
    // ONE pass, no filter/union split (a union of two filters of `joined`
    // would plan the explode + aggregation + join subtree twice): the
    // promptless (null-key) rows share a single window partition, but
    // their outputs are overridden per row, so correctness never depends
    // on that partition's contents — only its size matters, and records
    // with no user turn are rare by construction.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("prompt_norm"))
    joined
      .withColumn("group_size",
        when(col("prompt_norm").isNull, lit(1L))
          .otherwise(count(lit(1)).over(w)))
      .withColumn("__best__", struct(negate(col("__score__")), col("__id__")))
      .withColumn("keep",
        when(col("prompt_norm").isNull, lit(true))
          .otherwise(col("__best__") === min(col("__best__")).over(w)))
      .select(col("__id__").as(idCol), col("prompt_norm"),
        col("group_size").cast("bigint").as("group_size"), col("keep"))
  }
}
