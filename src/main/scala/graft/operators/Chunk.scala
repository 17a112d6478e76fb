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
 * end; chunks are emitted while `i*stride < n_tokens`, so the last
 * chunk may be shorter and every token belongs to >= 1 chunk. Pure
 * scan-side explode — no shuffle, no state, linear in corpus size.
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
    val ws = split(trim(col(textCol)), "\\s+")
    val nChunks = ceil(size(ws).cast("double") / stride).cast("int")
    df.select(col(idCol), ws.as("__ws"), nChunks.as("__nc"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), greatest(col("__nc"), lit(1)) - 1),
          i => array_join(slice(col("__ws"), i * stride + 1, lit(chunkSize)), " "))))
      .toDF(idCol, "chunk_no", "chunk_text")
      .withColumn("chunk_tokens",
        size(split(col("chunk_text"), "\\s+")))
  }
}
