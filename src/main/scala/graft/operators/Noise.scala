package graft.operators

import graft.Tok
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic span-corruption noising — the T5/UL2 pretraining
 * objective (Raffel et al. 2020 §3.1.4): mask token positions, merge
 * ADJACENT masked positions into spans, replace each span in the
 * input with one sentinel `<extra_id_k>`, and emit the target as the
 * sentinel-delimited sequence of the original spans. RNG is replaced
 * by the repo's md5-bucket rule keyed on `(doc_id, position)` — the
 * same example always corrupts the same way, across engines, runs,
 * and corpus growth (the hash-split discipline; a seeded RNG would
 * couple the mask to partitioning).
 *
 * The whole transformation is ONE scan-side `aggregate` HOF walking
 * the token array with a (input, target, span_count, masked_count,
 * prev_masked) struct state — no explode, no shuffle, no per-token
 * rows (the CDC-chunking shape): at 100 TB this is a pure map stage.
 * The oracle restates it as per-token rows + an islands window, which
 * must produce the IDENTICAL strings.
 */
object Noise {

  /**
   * @param ratePct mask a position iff its md5 bucket (mod 100) is
   *        below this percentage. Adjacent masked positions merge —
   *        with independent position masks the expected span length is
   *        `1/(1-p)`, the degenerate-geometry version of T5's mean-3
   *        spans; the SPAN mechanics (merge, sentinel numbering,
   *        target layout) are exactly the objective's.
   * @return idCol, n_tokens, n_masked, n_spans, corrupted, target
   */
  def spanCorrupt(
      df: DataFrame, idCol: String, textCol: String,
      ratePct: Int): DataFrame = {
    require(ratePct >= 1 && ratePct < 100, "ratePct in [1, 100)")
    val toks = call_function("regexp_extract_all",
      col(textCol), lit(Tok.Pattern), lit(0))
    // (token, masked?) pairs via the indexed transform (1-based
    // positions; an empty token array stays empty), scan-side
    val withPos = transform(toks, (tk, i) =>
      struct(tk.as("tk"),
        (conv(substring(md5(concat_ws("_", col(idCol), i + 1)), 1, 8), 16, 10)
          .cast("long") % 100 < ratePct).as("m")))
    val zero = struct(lit("").as("inp"), lit("").as("tgt"),
      lit(0).as("k"), lit(0).as("nm"), lit(false).as("prev"))
    def app(s0: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) = {
      val sent = concat(lit("<extra_id_"), s0("k"), lit(">"))
      def j(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        when(a === "", b).otherwise(concat(a, lit(" "), b))
      when(x("m") && !s0("prev"), struct(
          j(s0("inp"), sent).as("inp"),
          j(s0("tgt"), concat(sent, lit(" "), x("tk"))).as("tgt"),
          (s0("k") + 1).as("k"), (s0("nm") + 1).as("nm"), lit(true).as("prev")))
        .when(x("m"), struct(
          s0("inp").as("inp"),
          concat(s0("tgt"), lit(" "), x("tk")).as("tgt"),
          s0("k").as("k"), (s0("nm") + 1).as("nm"), lit(true).as("prev")))
        .otherwise(struct(
          j(s0("inp"), x("tk")).as("inp"),
          s0("tgt").as("tgt"),
          s0("k").as("k"), s0("nm").as("nm"), lit(false).as("prev")))
    }
    val st = aggregate(withPos, zero, app)
    df.select(col(idCol),
      size(toks).as("n_tokens"),
      st("nm").as("n_masked"),
      st("k").as("n_spans"),
      st("inp").as("corrupted"),
      st("tgt").as("target"))
  }

  /**
   * Fill-in-the-middle transformation (Bavarian et al. 2022; the
   * StarCoder/code-model data recipe): split the token sequence at two
   * deterministic cut points and emit the PSM layout
   * `<PRE> prefix <SUF> suffix <MID> middle`, so a causal LM learns
   * infilling "for free". `fimPct` of documents transform (the paper's
   * fim_rate); the rest pass through as `plain` with the same
   * token-normalized text, so downstream packing sees one column.
   *
   * Determinism is the md5-bucket rule keyed on the document id — the
   * gate bucket picks the mode, two independent cut hashes in
   * [0, n_tokens] sort into (lo, hi) — identical across engines, runs,
   * partitionings, and corpus growth. Everything is scan-side
   * (`slice` + `array_join` on the token array): a pure map stage at
   * 100 TB, no explode, no shuffle.
   *
   * @return idCol, n_tokens, mode ('psm'|'plain'), cut_lo, cut_hi, out
   */
  def fimTransform(
      df: DataFrame, idCol: String, textCol: String,
      fimPct: Int): DataFrame = {
    require(fimPct >= 1 && fimPct <= 100, "fimPct in [1, 100]")
    val toks = call_function("regexp_extract_all",
      col(textCol), lit(Tok.Pattern), lit(0))
    val n = size(toks)
    def bucket(tag: String, mod: org.apache.spark.sql.Column) =
      conv(substring(md5(concat_ws("_", col(idCol), lit(tag))), 1, 8), 16, 10)
        .cast("long") % mod
    val doFim = bucket("fim", lit(100L)) < fimPct
    val c1 = bucket("cut1", (n + 1).cast("long"))
    val c2 = bucket("cut2", (n + 1).cast("long"))
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val prefix = array_join(slice(toks, lit(1), lo.cast("int")), " ")
    val middle = array_join(
      slice(toks, (lo + 1).cast("int"), (hi - lo).cast("int")), " ")
    val suffix = array_join(
      slice(toks, (hi + 1).cast("int"), (n - hi).cast("int")), " ")
    val psm = concat(lit("<PRE> "), prefix, lit(" <SUF> "), suffix,
      lit(" <MID> "), middle)
    df.select(col(idCol),
      n.as("n_tokens"),
      when(doFim, lit("psm")).otherwise(lit("plain")).as("mode"),
      when(doFim, lo).otherwise(lit(null).cast("long")).as("cut_lo"),
      when(doFim, hi).otherwise(lit(null).cast("long")).as("cut_hi"),
      when(doFim, psm).otherwise(array_join(toks, " ")).as("out"))
  }
}
