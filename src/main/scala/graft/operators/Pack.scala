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
    val offsets = base.groupBy(pcols :+ col("__g"): _*).agg(sum("n_tokens").as("__gsum"))
      .withColumn("__goff", coalesce(sum("__gsum").over(wg), lit(0)))
      .select(pcols :+ col("__g") :+ col("__goff"): _*)

    val win = Window.partitionBy(pcols :+ col("__g"): _*).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), partitionCols :+ "__g")
      .withColumn("__before", col("__goff") + coalesce(sum("n_tokens").over(win), lit(0)))
      .select(pcols :+ col(idCol) :+ col("n_tokens") :+
        floor(col("__before") / capacity).cast("long").as("bin"): _*)
  }
}
