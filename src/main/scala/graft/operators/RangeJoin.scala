package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bucketed interval (range) join: for each left row, the right rows
 * with the same key and `rTimeCol` in `[lTime - windowSec, lTime]`
 * (bounds inclusive; times in epoch seconds or any consistent unit
 * when `bucketWidth` is given in the same unit).
 *
 * The naive formulation — an inequality-only join condition — degrades
 * to a per-key cross join (quadratic in the hot key's row count). The
 * scalable shape used here is the standard bucketing trick: right rows
 * are keyed by `floor(t / window)`, left rows are exploded to the TWO
 * buckets that can contain a match (`floor(t/w)` and `floor(t/w) - 1`
 * — the interval spans at most two buckets because its length equals
 * the bucket width), and the join is a plain equi-join on
 * `(key, bucket)` with the exact range predicate applied afterwards.
 * Cost: 2x the left rows through one hash join — never O(n*m) per key,
 * which is what survives a 100x scale-up. Skewed hot keys follow the
 * usual remedies (salting / AQE skew join) on the equi-join.
 *
 * Output: all left columns plus the right payload columns prefixed
 * `ij_` (inner semantics — unmatched left rows are absent; wrap with a
 * left join against the original probe side for outer semantics, as
 * q57 does).
 */
object RangeJoin {

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      lTimeCol: String,
      rTimeCol: String,
      windowSec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val reserved = Set("__lb", "__rb", "__k")
    val clashing = (left.columns ++ right.columns).filter(reserved)
    require(clashing.isEmpty,
      s"intervalJoin reserves ${reserved.mkString(", ")}; rename: ${clashing.mkString(", ")}")
    val prefixClash = right.columns.filterNot(_ == keyCol).map("ij_" + _)
      .toSet.intersect(left.columns.toSet)
    require(prefixClash.isEmpty,
      "intervalJoin outputs right payload columns as ij_<name>; left already has: " +
        prefixClash.mkString(", "))

    val rPayload = right.columns.filterNot(_ == keyCol).toSeq
    val l = left.withColumn("__lb",
      explode(array(floor(col(lTimeCol) / windowSec),
        floor(col(lTimeCol) / windowSec) - 1)))
    val r = right.select(
      col(keyCol).as("__k") +: floor(col(rTimeCol) / windowSec).as("__rb") +:
        rPayload.map(c => col(c).as(s"ij_$c")): _*)
    l.join(r,
        col(keyCol) === col("__k") && col("__lb") === col("__rb") &&
          col(s"ij_$rTimeCol") >= col(lTimeCol) - windowSec &&
          col(s"ij_$rTimeCol") <= col(lTimeCol))
      .drop("__lb", "__rb", "__k")
  }
}
