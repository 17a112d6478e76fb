package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Preference-pair construction — the DPO/RLHF reward-data step: for
 * each prompt group, pair the highest-scoring response (chosen)
 * against the lowest-scoring one (rejected), keeping only strict
 * preferences (gap >= minGap, distinct responses).
 *
 * Deterministic by construction: ties on score resolve to the SMALLER
 * response id on both sides — `max_by`/`min_by` would be
 * nondeterministic under ties, so both picks ride struct-ordered
 * min/max aggregates instead.
 *
 * Scale shape: ONE groupBy on the prompt key — the struct min/max
 * aggregates combine map-side, so the exchange carries one 3-field
 * struct pair per (task × prompt), never the response rows. No
 * window, no second shuffle, no per-group sort.
 */
object Preference {

  /**
   * @param df        responses: one row per (prompt, response)
   * @param promptCol grouping key
   * @param idCol     response id (orderable; tie-breaks and output)
   * @param scoreCol  numeric preference score (higher = better)
   * @param minGap    minimum chosen−rejected score gap to emit
   */
  def pairs(df: DataFrame, promptCol: String, idCol: String,
      scoreCol: String, minGap: Column): DataFrame = {
    val s = col(scoreCol)
    val id = col(idCol)
    // chosen: max by (score, −id) → ties land on the smaller id;
    // rejected: min by (score, id) → ties land on the smaller id.
    df.groupBy(promptCol)
      .agg(
        max(struct(s.as("s"), (-id).as("ni"), id.as("id"))).as("ch"),
        min(struct(s.as("s"), id.as("id"))).as("rj"))
      .select(col(promptCol),
        col("ch.id").as("chosen_id"), col("ch.s").as("chosen_score"),
        col("rj.id").as("rejected_id"), col("rj.s").as("rejected_score"),
        (col("ch.s") - col("rj.s")).as("gap"))
      .filter(col("chosen_id") =!= col("rejected_id") && col("gap") >= minGap)
  }
}
