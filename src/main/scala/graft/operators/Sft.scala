package graft.operators

import graft.Tok
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * SFT chat-template rendering with loss-mask spans — the
 * supervised-fine-tuning data step: serialize a multi-turn
 * conversation into the model's chat template and record the
 * character spans of ASSISTANT content, because the SFT loss trains
 * only on assistant tokens (the user/system turns are context, masked
 * out of the objective).
 *
 * Template (ChatML-flavored): turns joined by single spaces as
 * `<|user|> …content… <|assistant|> …content… …`; the mask spans are
 * `[start, end)` character offsets into the rendered string covering
 * each assistant turn's content. Spans ship as a `"s:e,s:e"` string
 * (the array-outputs-as-strings oracle convention).
 *
 * The rendering is ONE scan-side `aggregate` HOF over the turn list —
 * the state carries (rendered, spans, masked-char count) and the
 * offsets fall out of `length(rendered)` as it grows. No explode, no
 * shuffle: a pure map stage at 100 TB.
 */
object Sft {

  /**
   * Chunk the token stream into fixed-size turns with alternating
   * roles (even = user, odd = assistant) — the deterministic
   * conversation synthesis for corpora that are not dialogue-shaped —
   * then render. @return idCol, n_turns, n_mask_chars, rendered,
   * mask_spans
   */
  def renderTurns(
      df: DataFrame, idCol: String, textCol: String,
      turnTokens: Int): DataFrame = {
    require(turnTokens >= 1, "turnTokens must be >= 1")
    val toks = call_function("regexp_extract_all",
      col(textCol), lit(Tok.Pattern), lit(0))
    val nTurns = ceil(size(toks).cast("double") / turnTokens).cast("int")
    // turn i (1-based): tokens [(i-1)·turnTokens + 1 .. i·turnTokens]
    val turns = transform(sequence(lit(1), nTurns), i =>
      struct(
        (i % 2 === 1).as("user"),
        array_join(slice(toks, (i - lit(1)) * turnTokens + 1, lit(turnTokens)), " ")
          .as("content")))
    val zero = struct(lit("").as("out"), lit("").as("spans"), lit(0L).as("nm"))
    val walked = aggregate(
      when(size(toks) > 0, turns).otherwise(array().cast(
        "array<struct<user:boolean,content:string>>")),
      zero,
      (s, t) => {
        val role = when(t("user"), lit("<|user|>")).otherwise(lit("<|assistant|>"))
        val prefix = concat(
          when(s("out") === "", lit("")).otherwise(lit(" ")), role, lit(" "))
        val start = length(s("out")).cast("long") + length(prefix).cast("long")
        val end = start + length(t("content")).cast("long")
        val span = concat(start.cast("string"), lit(":"), end.cast("string"))
        struct(
          concat(s("out"), prefix, t("content")).as("out"),
          when(t("user"), s("spans"))
            .otherwise(when(s("spans") === "", span)
              .otherwise(concat(s("spans"), lit(","), span))).as("spans"),
          (s("nm") + when(t("user"), lit(0L)).otherwise(end - start)).as("nm"))
      })
    df.select(col(idCol),
      when(size(toks) > 0, nTurns).otherwise(lit(0)).as("n_turns"),
      walked("nm").as("n_mask_chars"),
      walked("out").as("rendered"),
      walked("spans").as("mask_spans"))
  }
}
