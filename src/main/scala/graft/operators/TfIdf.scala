package graft.operators

import graft.Tok
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * TF-IDF top-term extraction (keyword tagging for corpus exploration
 * and near-dup triage): per document, the k terms with the highest
 * `tf * (ln((N+1)/(df+1)) + 1)` (smoothed idf), ties broken by term.
 *
 * Plan shape: one explode pass for term frequencies (groupBy doc+term
 * with map-side combine), one tiny groupBy for document frequencies,
 * a keyed join, and a per-doc window for the top-k — everything keyed
 * by term or doc id, the corpus count is a one-row broadcast. At
 * 100 TB the df table is large but partitioned; nothing is collected.
 */
object TfIdf {

  def topTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val terms = df.select(col(idCol),
      explode(split(trim(col(textCol)), Tok.WsPlus)).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__N"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          (log((col("__N") + 1).cast("double") / (col("df") + 1).cast("double")) + 1.0))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      // floor-truncate for engine-exact comparison (see q54 note)
      .select(col(idCol), col("rank"), col("term"), col("tf"),
        (floor(col("score") * 1000000) / 1000000).as("score"))
  }
}
