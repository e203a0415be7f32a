package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning example assembly: conversation turns serialized
  * into ONE training string per conversation plus token-range LOSS MASKS
  * over the assistant turns — the data-prep step every chat/SFT pipeline
  * runs between "raw dialogues" and "token batches" (cf. the chat-template
  * + label-mask convention of InstructGPT-style SFT [Ouyang et al. 2022]
  * and every open chat fine-tune since: loss is computed ONLY on assistant
  * tokens; prompts, system text, and role headers are context).
  *
  * Template (whitespace-tokenization-aligned by construction): each turn
  * serializes as `<|role|> content <|end|>` and turns join with a single
  * space, so every turn occupies exactly `tokenCount(content) + 2`
  * whitespace tokens of the conversation string — one `<|role|>` header
  * token, the content tokens, one `<|end|>` token. The mask of an
  * assistant turn covers its content plus its `<|end|>` (the model must
  * learn to stop) and EXCLUDES the role header (that token is prompt
  * scaffolding the serving stack emits, not a prediction target).
  *
  * Shape: one hash aggregation keyed on the conversation id —
  * `sort_array(collect_list(struct(...)))` makes the fold order the TURN
  * ORDER, not arrival order, so the result is partitioning-invariant; the
  * running token offsets and mask spans come from one `aggregate` fold
  * over that sorted array (pure codegen-able builtins, no UDF, no window).
  * State per conversation is the turn list — bounded by dialogue length,
  * never by corpus size; at 100 TB the shuffle key is the conversation id
  * and nothing wider than one conversation is ever co-resident. */
object Sft {

  /** @return one row per conversation: (convCol, n_turns, n_tokens, text,
    *         mask) with mask = array of (tok_start, tok_end) half-open
    *         whitespace-token ranges over `text`, one per assistant turn,
    *         in turn order. */
  def assembleChat(turns: DataFrame, convCol: String, turnIdxCol: String,
                   roleCol: String, contentCol: String,
                   assistantRole: String = "assistant"): DataFrame = {
    val ntoks = graft.functions.TextAnalysis.tokenCount(col(contentCol))
      .cast("long")
    val piece = concat(lit("<|"), col(roleCol), lit("|> "),
      col(contentCol), lit(" <|end|>"))
    val sorted = sort_array(collect_list(struct(
      col(turnIdxCol).cast("long").as("i"), col(roleCol).as("r"),
      ntoks.as("n"), piece.as("p"))))
    // fold state: running token offset + the mask spans emitted so far
    val zero = struct(lit(0L).as("off"),
      array().cast("array<struct<tok_start:bigint,tok_end:bigint>>")
        .as("spans"))
    val spans = aggregate(col("__ts"), zero,
      (acc, t) => struct(
        (acc("off") + t("n") + lit(2L)).as("off"),
        when(t("r") === lit(assistantRole),
          concat(acc("spans"), array(struct(
            (acc("off") + lit(1L)).as("tok_start"),
            (acc("off") + t("n") + lit(2L)).as("tok_end")))))
          .otherwise(acc("spans")).as("spans")),
      acc => acc("spans"))
    turns.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        sum(ntoks + lit(2L)).as("n_tokens"),
        sorted.as("__ts"))
      .select(col(convCol), col("n_turns"), col("n_tokens"),
        array_join(transform(col("__ts"), t => t("p")), " ").as("text"),
        spans.as("mask"))
  }

  /** Conversation-schema validation — the QA gate every SFT data build
    * runs BEFORE [[assembleChat]] (the fine-tune-upload validator
    * convention: broken role alternation or empty turns silently poison
    * loss masks downstream, so they must be rejected loudly upstream).
    * One row per conversation with independent checks plus the FIRST
    * violation in a fixed priority order:
    *
    *  - `idx_contiguous` — sorted turn indexes are exactly 0..n−1
    *    (a gap or duplicate means turns were lost or double-loaded)
    *  - `roles_known`    — every role ∈ `roles`
    *  - `starts_ok`      — the first role is `system` or `user`
    *  - `alternates_ok`  — after at most one leading `system`, roles
    *    strictly alternate user/assistant starting with `user`
    *    (vacuously true for a system-only conversation)
    *  - `content_nonempty` — every turn's content is non-blank after
    *    trimming (NULL counts as blank)
    *  - `ends_assistant` — the last turn is an `assistant` turn (a
    *    training example must end on a prediction target)
    *  - `is_valid` = all of the above; `first_violation` names the
    *    highest-priority failed check (idx_gap > unknown_role >
    *    bad_start > broken_alternation > empty_content >
    *    no_assistant_end), NULL when valid.
    *
    * Shape: the [[assembleChat]] discipline — one hash aggregation keyed
    * on the conversation id, `sort_array(collect_list(...))` so every
    * check folds the TURN order (partitioning-invariant), then pure
    * array builtins; state per conversation is the turn list, bounded by
    * dialogue length, never corpus size. */
  def validateChat(turns: DataFrame, convCol: String, turnIdxCol: String,
                   roleCol: String, contentCol: String,
                   roles: Seq[String] = Seq("system", "user", "assistant"))
    : DataFrame = {
    require(roles.contains("system") && roles.contains("user") &&
      roles.contains("assistant"),
      s"roles must include system/user/assistant, got $roles")
    val sorted = sort_array(collect_list(struct(
      col(turnIdxCol).cast("long").as("i"),
      col(roleCol).as("r"),
      col(contentCol).as("c"))))
    val l = col("__ts")
    val n = size(l)
    val idxs = transform(l, t => t("i"))
    val idxOk = idxs === sequence(lit(0L), (n - 1).cast("long"))
    val rolesArr = transform(l, t => t("r"))
    val known = forall(rolesArr, r => r.isInCollection(roles))
    val startsOk = element_at(rolesArr, 1)
      .isInCollection(Seq("system", "user"))
    val body = when(element_at(rolesArr, 1) === "system",
      slice(rolesArr, lit(2), n - 1)).otherwise(rolesArr)
    val altOk = when(size(body) === 0, lit(true)).otherwise(
      forall(zip_with(body, sequence(lit(1L), size(body).cast("long")),
        (r, i) => r === when(i % 2 === 1, lit("user"))
          .otherwise(lit("assistant"))),
        x => x))
    val endsOk = element_at(rolesArr, -1) === "assistant"
    val nonEmpty = forall(l,
      t => coalesce(length(trim(t("c"))) > 0, lit(false)))
    turns.groupBy(col(convCol))
      .agg(sorted.as("__ts"))
      .select(col(convCol), n.cast("long").as("n_turns"),
        idxOk.as("idx_contiguous"), known.as("roles_known"),
        startsOk.as("starts_ok"), altOk.as("alternates_ok"),
        nonEmpty.as("content_nonempty"), endsOk.as("ends_assistant"),
        (idxOk && known && startsOk && altOk && nonEmpty && endsOk)
          .as("is_valid"),
        when(!idxOk, lit("idx_gap"))
          .when(!known, lit("unknown_role"))
          .when(!startsOk, lit("bad_start"))
          .when(!altOk, lit("broken_alternation"))
          .when(!nonEmpty, lit("empty_content"))
          .when(!endsOk, lit("no_assistant_end"))
          .as("first_violation"))
  }
}
