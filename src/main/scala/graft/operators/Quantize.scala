package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Symmetric int8 embedding quantization — the standard storage/IO
 * reduction before ANN indexing at scale (4x smaller vectors, SIMD
 * int8 dot products downstream): per vector, `scale = max|x| / 127`
 * and `q_i = floor(x_i/scale + 0.5)` (half-up; expressed as
 * floor(+0.5) rather than round() because round()'s half-way behavior
 * differs between engines, and floor over identical IEEE inputs does
 * not). Zero vectors quantize to zeros with scale 0.
 *
 * Pure scan-side projection — no shuffle, no state.
 */
object Quantize {

  /** Adds `scale` (double) and `qvec` (array<int> in [-127, 127]). */
  def int8(df: DataFrame, embCol: String): DataFrame = {
    val e = col(embCol).cast("array<double>")
    df.withColumn("scale", array_max(transform(e, x => abs(x))) / 127.0)
      .withColumn("qvec",
        transform(e, x =>
          when(col("scale") === 0, lit(0))
            .otherwise(floor(x / col("scale") + 0.5).cast("int"))))
  }

  /** Dequantized vector for a quantized frame (q * scale). */
  def dequant(qvecCol: Column, scaleCol: Column): Column =
    transform(qvecCol, q => q.cast("double") * scaleCol)
}
