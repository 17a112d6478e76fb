package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for keyed joins at scale.
 *
 * Spark's AQE skew-join handles most cases at runtime
 * (`spark.sql.adaptive.skewJoin.enabled`, on by default); explicit
 * salting remains the tool when one side's hot keys are known and the
 * other side is small enough to replicate per salt — e.g. joining a
 * 100 TB event log against per-key metadata where a handful of keys
 * carry half the volume.
 */
object Skew {

  /**
   * Salted equi-join: the skewed (big) side gets a random salt in
   * [0, saltFactor); the small side is replicated `saltFactor` times;
   * the join key becomes (key, salt), splitting each hot key's rows
   * across `saltFactor` reducers instead of one.
   *
   * The salt is `pmod(hash(monotonically_increasing_id()), f)` —
   * deterministic per row position, no RNG state on executors.
   */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val salted = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
