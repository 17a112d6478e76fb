package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact duplicated-substring (span) detection — the ccnet/Gopher-class
 * "remove exact duplicated substrings" pass (public recipe: Lee et al.
 * 2022, "Deduplicating Training Data Makes Language Models Better",
 * which uses a suffix array; the distributed equivalent below uses
 * positional window hashes, which finds exactly the duplicated spans of
 * >= `window` tokens).
 *
 * Unlike [[Winnow]] (which *scores* overlap via fingerprint samples),
 * this reports the exact maximal token ranges that occur more than once
 * in the corpus, per document — the input a span-excision rewrite needs.
 *
 * Scale shape: one pass computes positional k-gram hashes per doc
 * (native [[graft.functions.GramHashes]], one md5 per window); the
 * duplicated-hash set comes from ONE keyed aggregate on the hash (a
 * count>1 filter — map-side partial aggregation applies); marking is a
 * keyed semi-join hash->doc (never all-pairs); span merging is one
 * window function per doc (gaps-and-islands on consecutive positions).
 * Everything is keyed by hash or doc id — no pairwise doc joins at all,
 * so output scales with duplicated-window volume, not corpus^2.
 */
object SpanDedup {

  /**
   * Maximal duplicated spans of >= `window` tokens.
   *
   * A token window (length `window`, starting at 0-based token position
   * `pos`) is DUPLICATED when its text occurs >1 times corpus-wide
   * (across docs or repeated within one doc). Overlapping/adjacent
   * duplicated windows merge into maximal spans.
   *
   * Output: (idCol, span_start, span_end, n_windows) — token positions,
   * both ends inclusive (`span_end = last window start + window - 1`),
   * n_windows = merged window count in the span.
   */
  /** Shared detection front end: positional window hashes + the
    * corpus-wide duplicated-hash set. One tokenize+md5 pass
    * (checkpointed — the dup aggregate AND the downstream join both
    * read it; self-join aliases defeat exchange reuse, same discipline
    * as Dedup). */
  private def dupGrams(
      df: DataFrame, idCol: String, textCol: String, window: Int): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val grams = df.select(
      col(idCol),
      posexplode(graft.functions.GramHashes.gram_hashes(spark, col(textCol), window)))
      .toDF(idCol, "pos", "h")
      .transform(Checkpoints.cp)
    // count>1 keeps output proportional to true duplication; partial
    // counts map-side
    val dup = grams.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select("h")
    (grams, dup)
  }

  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String, window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val (grams, dup) = dupGrams(df, idCol, textCol, window)
    // windows of each doc that are duplicated: keyed join on the hash
    val marked = grams.join(dup, Seq("h")).select(idCol, "pos")
    // islands merge OVERLAPPING OR CONTIGUOUS windows: window at `pos`
    // covers [pos, pos+window-1], so it extends the previous region
    // whenever pos <= prev + window. A plain pos-row_number grouping
    // would split duplicated starts with a gap of 2..window-1 into
    // OVERLAPPING "maximal" spans (e.g. duplicated starts {0, 2},
    // window 3: spans [0,2] and [2,4] share token 2).
    val w = Window.partitionBy(idCol).orderBy("pos")
    marked
      .withColumn("__brk",
        when(col("pos") > lag("pos", 1).over(w) + window, 1).otherwise(0))
      .withColumn("__grp", sum("__brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__grp"))
      .agg(
        min("pos").cast("long").as("span_start"),
        (max("pos") + window - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("__grp")
  }

  /**
   * Span EXCISION — the rewrite pass over [[duplicatedSpans]]'s
   * detection: remove duplicated text but KEEP ONE COPY corpus-wide
   * (Lee et al.'s dedup semantics).
   *
   * Rule, stated per window occurrence: the CANONICAL occurrence of a
   * duplicated window is the globally smallest (doc, pos) holding its
   * content; a token is excised when it is covered by at least one
   * duplicated window but by NO canonical-occurrence window in its own
   * document. So the first document to state a repeated passage keeps
   * it verbatim; later restatements lose exactly the repeated tokens.
   *
   * Scale shape: everything from [[duplicatedSpans]] plus one window
   * function over each duplicated hash's occurrence list (tiny: only
   * duplicated windows participate) and a token-coverage explode whose
   * size is (duplicated windows) x window — proportional to true
   * duplication, never to corpus^2. The rebuild groups tokens per doc;
   * per-doc data is bounded by doc length.
   *
   * Output: (idCol, clean_text, n_removed) — the doc's surviving
   * tokens space-joined, and how many token positions were excised.
   * Docs with nothing duplicated pass through with n_removed = 0
   * (whitespace normalized to single spaces by the token rebuild).
   */
  def exciseSpans(df: DataFrame, idCol: String, textCol: String, window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val (grams, dup) = dupGrams(df, idCol, textCol, window)
    // occurrences of duplicated windows, with the global first flagged;
    // the per-hash window is tiny (only duplicated hashes participate)
    val occW = Window.partitionBy("h").orderBy(col(idCol), col("pos"))
    val occ = grams.join(dup, Seq("h"))
      .withColumn("__canon", row_number().over(occW) === 1)
    // token coverage: (id, tokpos) covered by dup windows, split by
    // whether ANY covering window in this doc is canonical
    val covered = occ.select(
      col(idCol), col("__canon"),
      explode(sequence(col("pos"), col("pos") + window - 1)).as("tokpos"))
    val removed = covered.groupBy(col(idCol), col("tokpos"))
      .agg(max(col("__canon")).as("__any_canon"))
      .filter(!col("__any_canon"))
      .select(col(idCol), col("tokpos"))
    // rebuild: tokens minus removed positions, in order
    // Column-API call (not string interpolation into expr): column
    // names needing quoting work the same here as everywhere else
    val toks = df.select(col(idCol), col(textCol))
      .select(col(idCol),
        posexplode_outer(
          call_function("regexp_extract_all", col(textCol), lit(graft.Tok.Pattern), lit(0))))
      .toDF(idCol, "tokpos", "tok")
    toks.join(removed.withColumn("__rm", lit(1)), Seq(idCol, "tokpos"), "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("__rm").isNull,
              struct(col("tokpos"), col("tok"))))),
            s => s.getField("tok"))).as("clean_text"),
        sum(when(col("__rm").isNotNull, 1L).otherwise(0L)).as("n_removed"))
  }
}
