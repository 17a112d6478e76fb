package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Soft-watermark DETECTION (Kirchenbauer et al. 2023, "A Watermark
 * for Large Language Models") — the corpus-side filter a training
 * pipeline runs to keep watermarked model output OUT of its data: a
 * gamma = 1/2 watermark biases each step's "green" half of the
 * vocabulary (membership = md5("<prev>:<tok>") parity — the same
 * function [[graft.torch.Torch.generateGreedy]]'s `watermarkDelta`
 * biases with, so detection and generation share one definition),
 * making green-token frequency the test statistic:
 * `z = (2·greens − T) / sqrt(T)` over the document's T adjacent
 * token pairs; natural text sits near z = 0, watermarked text drifts
 * up with delta and length.
 *
 * Cross-engine determinism: greens/T are INTEGER counts of exact md5
 * parities; the flag avoids the sqrt entirely —
 * `z > 2 ⟺ (2g − T) > 0 ∧ (2g − T)² > 4T`, integer arithmetic only —
 * and the reported z quantizes to 6 dp (sqrt is correctly rounded
 * IEEE on both engines; the division's last ulp dies on the grid).
 *
 * Plan shape: ONE scan-side pass — the pair walk is a zip_with over
 * the token array (no self-join, no explode), the counts are
 * per-row; docs with fewer than 2 tokens have no statistic and are
 * excluded (T = 0 cannot be z-scored).
 */
object Watermark {

  /** Per-token-pair green membership, columnar (no UDF): the md5
    * leading 32 bits of `"<prev>:<cur>"` mod `den`, below `num` —
    * [[graft.torch.Torch]]'s `Sampling.greenToken` restated; (1, 2)
    * is the original parity rule. */
  private def isGreen(prev: Column, cur: Column, num: Int, den: Int): Column =
    conv(substring(md5(concat(prev.cast("string"), lit(":"),
      cur.cast("string"))), 1, 8), 16, 10).cast("long") % den.toLong < num.toLong

  /**
   * General-gamma detector (round 17, VERDICT r16 item 4): under a
   * green fraction `gamma = num/den` the statistic is
   * `z = (g − γT) / sqrt(T·γ·(1−γ))`; multiplying through by `den`
   * gives the all-integer core `D = den·g − num·T` with
   * `z = D / sqrt(T·num·(den−num))`, so the flag stays integer-only:
   * `z > 2 ⟺ D > 0 ∧ D² > 4·T·num·(den−num)`. At (1, 2) both the
   * reported z6 and the flag reduce BIT-EXACTLY to the original
   * parity detector (D = 2g − T, T·1·1 = T — same longs, same
   * doubles; spec-pinned).
   *
   * @param tokenIds integer token-id array column (the same id space
   *        the generator watermarks over)
   * @param gamma    the green-list fraction as (num, den), 0 < num < den
   * @return (idCol, t_pairs, greens, z6, wm_flag) — one row per doc
   *         with >= 2 tokens
   */
  def greenFractionZ(df: DataFrame, idCol: String,
      tokenIds: Column, gamma: (Int, Int) = (1, 2)): DataFrame = {
    val (num, den) = gamma
    require(num >= 1 && num < den,
      "gamma must be a fraction num/den with 0 < num < den")
    val ws = tokenIds
    val prevs = slice(ws, lit(1), greatest(size(ws) - 1, lit(0)))
    val nexts = slice(ws, lit(2), greatest(size(ws) - 1, lit(0)))
    val d = lit(den.toLong) * col("greens") - lit(num.toLong) * col("t_pairs")
    val varScale = num.toLong * (den - num).toLong // den² · γ(1−γ) per T
    df.select(col(idCol),
        (size(ws) - 1).cast("long").as("t_pairs"),
        size(filter(zip_with(prevs, nexts, (a, b) => isGreen(a, b, num, den)),
          x => x)).cast("long").as("greens"))
      .filter(col("t_pairs") >= 1L)
      .withColumn("z6", round(
        d.cast("double") /
          sqrt((col("t_pairs") * lit(varScale)).cast("double")), 6))
      .withColumn("wm_flag",
        (d > 0L) && (d * d > lit(4L * varScale) * col("t_pairs")))
  }
}
