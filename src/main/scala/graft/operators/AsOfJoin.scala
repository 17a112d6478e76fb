package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join: for each left row, attach the most recent
 * right row with the same key and `timeCol` <= the left row's time.
 * The workhorse of feature backfills ("latest purchase before this
 * click", "last model score before this event").
 *
 * Spark has no built-in as-of join; the naive formulations are a range
 * join (`l.key = r.key AND r.t <= l.t` — quadratic per key) or a
 * per-key `collect + binary search` (driver-side). This one is the
 * scalable shape: tag both sides, UNION them, and take a running
 * `last(payload, ignoreNulls)` over a single `(key, time)` window —
 * exactly ONE shuffle on the key, no pair blow-up, and the window is
 * `rowsBetween(unboundedPreceding, current)` so it streams within each
 * partition. Skewed hot keys are the usual window caveat (AQE does not
 * split a window partition); salt upstream if one key dominates.
 *
 * Ordering inside a key is `(timeCol, side, tieCol)` with the right
 * side sorting FIRST at equal timestamps — i.e. a right row at exactly
 * the left row's time IS visible (inclusive `<=`, matching DuckDB /
 * pandas `merge_asof(allow_exact_matches=True)` semantics); among
 * right rows sharing a timestamp the greatest `tieCol` wins.
 */
object AsOfJoin {

  /**
   * @param left    probe side; all its columns are kept
   * @param right   build side; all its non-key columns come back as
   *                `asof_<name>` (null when no right row precedes)
   * @param keyCol  equi-join key present in both sides
   * @param timeCol ordering column present in both sides
   * @param tieCol  deterministic tie-break present in both sides
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String): DataFrame = {
    // The union/window plumbing uses fixed internal names and the output
    // prefixes right payload columns with `asof_`; collide-able inputs
    // would otherwise fail with ambiguous-column errors or silently
    // shadow — reject them up front with a clear message.
    val reserved = Set("__k", "__t", "__tb", "__side", "__r", "__l", "__last_r")
    val clashing = (left.columns ++ right.columns).filter(reserved)
    require(clashing.isEmpty,
      s"asofJoin reserves internal column names ${reserved.mkString(", ")}; " +
        s"rename input columns: ${clashing.distinct.mkString(", ")}")
    val prefixClash = right.columns.filterNot(_ == keyCol).map("asof_" + _)
      .toSet.intersect(left.columns.toSet)
    require(prefixClash.isEmpty,
      s"asofJoin outputs right payload columns as asof_<name>; left already has: " +
        prefixClash.mkString(", "))
    val rPayloadCols = right.columns.filterNot(_ == keyCol).toSeq
    val lCols = left.columns.toSeq
    val rStruct = struct(rPayloadCols.map(col): _*)
    val rType = {
      import org.apache.spark.sql.types._
      StructType(rPayloadCols.map(c =>
        StructField(c, right.schema(c).dataType, nullable = true)))
    }
    val lStruct = struct(lCols.map(col): _*)
    val lType = {
      import org.apache.spark.sql.types._
      StructType(lCols.map(c =>
        StructField(c, left.schema(c).dataType, nullable = true)))
    }

    val taggedR = right.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), col(tieCol).as("__tb"),
      lit(0).as("__side"), rStruct.as("__r"), lit(null).cast(lType).as("__l"))
    val taggedL = left.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), col(tieCol).as("__tb"),
      lit(1).as("__side"), lit(null).cast(rType).as("__r"), lStruct.as("__l"))

    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedR.unionByName(taggedL)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        lCols.map(c => col(s"__l.$c").as(c)) ++
          rPayloadCols.map(c => col(s"__last_r.$c").as(s"asof_$c")): _*)
  }
}
