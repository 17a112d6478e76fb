package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering — the multidimensional-locality layout
 * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving
 * the bits of two dimension keys gives a single sort key under which
 * rows close in BOTH dimensions land close on disk, so scans filtered
 * on either (or both) dimensions touch far fewer files than a
 * single-column sort allows.
 *
 * The interleave is pure codegen'd bit arithmetic (magic-number
 * spreading, the standard O(log bits) construction) — no UDF, and
 * exactly reproducible in any engine with shifts and masks, which the
 * oracle does literally.
 *
 * Scale shape: [[cluster]] is one `repartitionByRange` on the z-key
 * (Spark samples range bounds — the standard write-layout shuffle)
 * plus an in-partition sort; downstream writers get min/max z (and
 * therefore tight x/y) statistics per file.
 */
object ZOrder {

  /** Spread the low 16 bits of `v` to even bit positions (0,2,4,...). */
  private def spread16(v: Column): Column =
    Seq((8, 16711935L), (4, 252645135L), (2, 858993459L), (1, 1431655765L))
      .foldLeft(v.cast("long").bitwiseAND(lit(65535L))) {
        case (acc, (s, mask)) =>
          acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(mask))
      }

  /** 32-bit Morton key of two 16-bit dimension values (each taken
    * modulo 2^16 — quantize/rank wider domains first). */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Range-partition + sort the frame by the z-value of the two
    * dimensions: the write-side clustering pass. */
  def cluster(df: DataFrame, xCol: Column, yCol: Column, numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, "numPartitions must be >= 1")
    df.withColumn("__z", morton2(xCol, yCol))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
