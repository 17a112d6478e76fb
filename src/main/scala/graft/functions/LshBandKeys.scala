package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/**
 * `lsh_band_keys(array<double>, numPlanes, bands, seed) -> array<long>`:
 * random-hyperplane LSH signature in ONE pass — the sign bit of the
 * embedding's dot product against `numPlanes` seeded Gaussian planes,
 * grouped into `bands` keys of `numPlanes/bands` bits each.
 *
 * Output layout: `bands` band keys followed by `ceil(numPlanes/64)`
 * packed signature words (all bits, 64 per long) — the words let
 * candidate pairs be hamming-prefiltered without re-touching the
 * embedding arrays.
 *
 * A native expression because the composed form (one `dot_product`
 * call per plane, shift/OR per band) rebuilds the whole signature per
 * consuming expression when the projection is interpreted — at 128
 * planes x 64 dims that recomputation dominated the near-dup stage.
 * Planes are generated lazily per input dimension from the fixed seed
 * (deterministic across executors; ~64 KB at 128x64, far below
 * broadcast-worthy size).
 */
case class LshBandKeys(child: Expression, numPlanes: Int, bands: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(numPlanes % bands == 0, "bands must divide numPlanes")
  private val width = numPlanes / bands
  require(width <= 64, "band width must fit in a long")
  private val nWords = (numPlanes + 63) / 64

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"lsh_band_keys requires array<double>, got ${other.sql}")
  }

  // plane matrix per input dim, flattened plane-major (same generation
  // order as a per-plane Array.fill, so results are stable across
  // refactors of the composed form)
  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()
  private def planesFor(dim: Int): Array[Double] =
    planeCache.computeIfAbsent(dim, { d =>
      val rnd = new scala.util.Random(seed)
      Array.fill(numPlanes * d)(rnd.nextGaussian())
    })

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      x(i) = arr.getDouble(i)
      i += 1
    }
    val ps = planesFor(dim)
    val out = new Array[Long](bands + nWords)
    var plane = 0
    var off = 0
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < width) {
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += ps(off + d) * x(d); d += 1 }
        if (dot >= 0) {
          key |= (1L << j)
          out(bands + (plane >> 6)) |= (1L << (plane & 63))
        }
        plane += 1
        off += dim
        j += 1
      }
      out(b) = key
      b += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

object LshBandKeys {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_band_keys",
      (exprs: Seq[Expression]) =>
        LshBandKeys(
          exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue(),
          exprs(3).eval().asInstanceOf[Number].longValue()),
      "built-in")

  def lsh_band_keys(
      spark: SparkSession, c: Column, numPlanes: Int, bands: Int, seed: Long = 42L): Column = {
    register(spark)
    call_function("lsh_band_keys", c, lit(numPlanes), lit(bands), lit(seed))
  }
}
