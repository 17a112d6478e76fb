package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-batch packing: assign documents to ~`capacity`-token bins
 * with the deterministic running-sum rule
 * `bin = floor(prefix_sum_before(tokens) / capacity)` over a fixed
 * global document order.
 *
 * The naive formulation is a single `Window.orderBy(id)` — a GLOBAL
 * ordered window, i.e. one task scanning the whole corpus: the classic
 * 100 TB serial bottleneck. This implementation computes the same
 * prefix sum in two levels:
 *
 *  1. per-group token totals (`group = id / groupSize`) — an ordinary
 *     hash aggregate, fully parallel;
 *  2. a global running offset over the per-group totals — a window
 *     over #groups rows (corpus/groupSize, tiny), broadcast back;
 *  3. a per-group prefix window (`partitionBy(group)`) — parallel
 *     across groups.
 *
 * Output is bit-identical to the naive global window because the
 * group id is monotone in the document order.
 *
 * ASSUMPTION — dense numeric ids: `#groups = id_range / groupSize`,
 * so the "tiny" offsets table is tiny only when ids are roughly
 * sequential. Sparse 64-bit ids (snowflake/hash-derived) would put
 * ~every doc in its own group — a corpus-sized broadcast and a serial
 * offsets window. An in-plan group-count guard (a one-row aggregate
 * folded into the offsets plan, evaluated lazily at execution time)
 * fails loudly in that case (re-key with `row_number` or
 * `zipWithIndex`-style dense ids first, or raise groupSize to cover
 * the actual id range).
 */
object Pack {

  /** @param partitionCols when non-empty, packing restarts per
    *        partition (e.g. one bin sequence per train/val/test split)
    *        — all partitions are packed by ONE plan, not one plan per
    *        partition value. Output columns: partitionCols ++
    *        (idCol, n_tokens, bin). */
  def packBins(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      capacity: Long,
      groupSize: Long = 4096L,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(capacity >= 1 && groupSize >= 1, "capacity and groupSize must be >= 1")
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packBins requires a numeric idCol; '$idCol' is ${df.schema(idCol).dataType.sql} " +
        "(a non-numeric id would cast to null and silently drop every row)")
    val pcols = partitionCols.map(col)
    val base = df.select(pcols :+ col(idCol) :+ tokensCol.as("n_tokens"): _*)
      .withColumn("__g", floor(col(idCol) / groupSize))

    val wg0 = if (partitionCols.isEmpty) Window.orderBy("__g")
      else Window.partitionBy(pcols: _*).orderBy("__g")
    val wg = wg0.rowsBetween(Window.unboundedPreceding, -1)
    val gAgg = base.groupBy(pcols :+ col("__g"): _*)
      .agg(sum("n_tokens").as("__gsum"), count(lit(1)).as("__gcnt"))
    // dense-id guard, IN-PLAN (lazy — no eager extra pass over the
    // upstream pipeline at call time): if the actual group count vastly
    // exceeds rows/groupSize, the offsets table is NOT tiny and the
    // design's premise is broken — raise_error loudly instead of OOMing
    // the broadcast or serializing the offsets window. The one-row
    // guard aggregate reuses gAgg's exchange; its value is folded into
    // __goff (always +0 when healthy) so column pruning cannot drop it.
    val guard = gAgg
      .agg(count(lit(1)).cast("double").as("__ng"), sum("__gcnt").cast("double").as("__n"))
      .select(
        when(col("__ng") > (col("__n") / groupSize + 1) * 10.0,
          raise_error(format_string(
            "packBins requires roughly dense ids: %.0f groups for %.0f rows " +
              s"(groupSize=$groupSize). Re-key with dense ids or raise groupSize " +
              "to cover the id range.", col("__ng"), col("__n"))))
          .otherwise(lit(0L)).as("__dense_ok"))
    val offsets = gAgg
      .crossJoin(broadcast(guard))
      .withColumn("__goff",
        coalesce(sum("__gsum").over(wg), lit(0)) + col("__dense_ok"))
      .select(pcols.zipWithIndex.map { case (c, i) => c.as(s"__po_$i") } :+
        col("__g").as("__g_o") :+ col("__goff"): _*)

    // NULL-SAFE join back: a null id (null __g) or a null partition
    // value forms its own group in the aggregate above, and <=> keeps
    // those rows — an equi-join would silently drop them from the
    // packed output
    val joinCond = (partitionCols.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__po_$i") } :+
      (col("__g") <=> col("__g_o"))).reduce(_ && _)
    val win = Window.partitionBy(pcols :+ col("__g"): _*).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), joinCond)
      .withColumn("__before", col("__goff") + coalesce(sum("n_tokens").over(win), lit(0)))
      .select(pcols :+ col(idCol) :+ col("n_tokens") :+
        floor(col("__before") / capacity).cast("long").as("bin"): _*)
  }

  /**
   * Packed-window composition with DOCUMENT BOUNDARIES — what a
   * packed-pretraining loader actually needs (Raffel et al. 2020 T5
   * packing; modern stacks mask cross-document attention): per bin,
   * the ordered member docs with their cumulative start offsets. The
   * `(doc_ids, starts, seq_len)` triple IS the block-diagonal
   * attention mask in compressed form — segment k attends
   * `[starts[k], starts[k] + len_k)`.
   *
   * Scale: [[packBins]]'s two-level prefix sum assigns bins without a
   * global window; the per-bin start offsets are a window PARTITIONED
   * by bin (parallel across bins, each bounded by `capacity` tokens
   * of members), and the composition groupBy shuffles once on the bin
   * key.
   */
  def packedBoundaries(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      capacity: Long): DataFrame = {
    val bins = packBins(df, idCol, tokensCol, capacity)
    val w = Window.partitionBy("bin").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    bins
      .withColumn("start", coalesce(sum("n_tokens").over(w), lit(0L)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("seq_len"),
        sort_array(collect_list(struct(col(idCol), col("start")))).as("__m"))
      .select(col("bin"), col("n_docs"), col("seq_len"),
        transform(col("__m"), m => m(idCol)).as("doc_ids"),
        transform(col("__m"), m => m("start")).as("starts"))
  }
}
