package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Document chunking: split each document into overlapping token-window
 * chunks — the standard preprocessing step for context-window-bounded
 * training and for embedding long documents.
 *
 * Chunk i covers tokens `[i*stride + 1, i*stride + chunkSize]`
 * (1-based, stride = chunkSize - overlap), clipped at the document
 * end. Chunk i > 0 is emitted only while the PREVIOUS chunk did not
 * already reach the document end (`(i-1)*stride + chunkSize < n`) —
 * a trailing window that would fit entirely inside the previous
 * chunk's overlap region adds zero new tokens and would inject a
 * verbatim duplicate of that chunk's suffix into the corpus the
 * operator prepares. Every token still belongs to >= 1 chunk; the
 * last chunk may be shorter. Token-less documents (empty, whitespace,
 * or null text) emit NO chunks — a phantom empty chunk would count
 * one token that does not exist. Pure scan-side explode — no shuffle,
 * no state, linear in corpus size.
 */
object Chunk {

  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need chunkSize > 0 and 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    // \S+ extraction (the repo-wide tokenization): 0 tokens for
    // empty/whitespace text, where split-on-\s+ yields a phantom ""
    val ws = call_function("regexp_extract_all", col(textCol), lit(graft.Tok.Pattern), lit(0))
    // null text -> null array -> treat as 0 tokens (size(null) is null,
    // and greatest() IGNORES nulls, so an uncoalesced count would let
    // null docs fall through the <=0 branch into one garbage chunk)
    val n = coalesce(size(ws), lit(0))
    val nChunks = when(n <= 0, lit(0)).otherwise(
      lit(1) + greatest(
        ceil((n - chunkSize).cast("double") / stride).cast("int"), lit(0)))
    df.select(col(idCol), ws.as("__ws"), nChunks.as("__nc"))
      .filter(col("__nc") > 0) // token-less / null docs emit nothing
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), col("__nc") - 1),
          i => struct(
            array_join(slice(col("__ws"), i * stride + 1, lit(chunkSize)), " ").as("t"),
            // token count from the slice itself — no re-tokenization
            // of the (overlap-inflated) chunk text
            size(slice(col("__ws"), i * stride + 1, lit(chunkSize))).as("k")))))
      .toDF(idCol, "chunk_no", "__c")
      .select(col(idCol), col("chunk_no"),
        col("__c.t").as("chunk_text"), col("__c.k").as("chunk_tokens"))
  }

  /**
   * Content-defined chunking: a chunk boundary falls AFTER any word
   * whose own 32-bit md5-prefix hash is ≡ 0 (mod `divisor`), giving
   * chunks of ~`divisor` words on average. Because the boundary rule
   * depends only on the word itself (a gear-style CDC with window 1),
   * an insertion or deletion perturbs AT MOST the one chunk it lands
   * in — every other chunk's text is byte-identical, which is the
   * property that makes chunk-level dedup robust to small edits
   * (fixed-stride chunking shifts every downstream chunk instead).
   *
   * Scale shape: the per-document running state (current chunk, closed
   * chunks) lives inside ONE `aggregate` higher-order function per row
   * — pure scan-side projection, zero shuffle, no per-word explode +
   * doc-keyed window (the row-blowup alternative the oracle uses).
   * `maxChunk` is the standard CDC max-size clamp: a run of
   * `maxChunk` boundary-free words closes the chunk anyway, bounding
   * the accumulator (and the O(len²) append copying) on adversarial
   * boundary-free documents; chunk sizes are geometric with mean
   * ~`divisor`, so an organic chunk reaching the default clamp has
   * probability (1 - 1/divisor)^4096 ≈ e^-64 — the clamp exists for
   * the pathological tail, not the typical path.
   */
  def chunkByContent(
      df: DataFrame,
      idCol: String,
      textCol: String,
      divisor: Int = 64,
      maxChunk: Int = 4096): DataFrame = {
    require(divisor >= 2, "divisor must be >= 2")
    require(maxChunk >= 1, "maxChunk must be >= 1")
    import org.apache.spark.sql.Column
    val ws = call_function("regexp_extract_all", col(textCol), lit(graft.Tok.Pattern), lit(0))
    def isBoundary(w: Column): Column =
      conv(substring(md5(w), 1, 8), 16, 10).cast("long") % divisor === 0
    val chunks = aggregate(
      coalesce(ws, array().cast("array<string>")),
      struct(array().cast("array<string>").as("chunks"), lit("").as("cur"),
        lit(0).as("n")),
      (acc, w) => {
        val grown = when(acc("cur") === "", w)
          .otherwise(concat(acc("cur"), lit(" "), w))
        val close = isBoundary(w) || (acc("n") + 1 >= maxChunk)
        struct(
          when(close, concat(acc("chunks"), array(grown)))
            .otherwise(acc("chunks")).as("chunks"),
          when(close, lit("")).otherwise(grown).as("cur"),
          when(close, lit(0)).otherwise(acc("n") + 1).as("n"))
      },
      acc => when(acc("cur") === "", acc("chunks"))
        .otherwise(concat(acc("chunks"), array(acc("cur")))))
    // the per-word aggregate HOF above is the most expensive scan-side
    // expression in the repo (string-building per token) — spread a
    // below-parallelism input so it does not serialize on one scan task
    graft.Spread(df).select(col(idCol), chunks.as("__cdc"))
      .select(col(idCol), posexplode(col("__cdc")))
      .toDF(idCol, "chunk_no", "chunk_text")
      .withColumn("chunk_tokens", size(split(col("chunk_text"), " ")))
  }
}
