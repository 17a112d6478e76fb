package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType, TimestampType}

/**
 * One-pass dataset profiler — the ingest-monitoring operator a 100 TB
 * pipeline runs on every new shard before it is admitted to the corpus
 * (row/null/distinct/min-max drift catches upstream schema breaks and
 * silent truncation long before a training job does).
 *
 * Shape at scale:
 *  - ONE aggregate job over the table produces every column's stats —
 *    no per-column scan loop (a naive `df.describe`-style loop is N
 *    full scans).
 *  - Exact `count(DISTINCT)` for several columns at once forces
 *    Spark's Expand — each row is replicated once per distinct
 *    aggregate before the shuffle, so the shuffle input is
 *    rows × columns. That is the correctness oracle here; the SCALE
 *    path is `approx_count_distinct` (HLL++), a fixed-size mergeable
 *    sketch per (column) with a plain partial/final aggregate. The
 *    profiler computes BOTH and gates the sketch against the exact
 *    count in-query, so the cheap estimator is certified every time
 *    the expensive one still fits.
 *  - Numeric and temporal min/max surface as doubles (epoch seconds
 *    for timestamps), strings as strings — both DuckDB-expressible,
 *    no engine-specific float formatting in the output.
 */
object Profile {

  /** Long-format profile: one row per profiled column with
    * (col_name, n, n_null, n_distinct, approx_ok, min_num, max_num,
    * min_str, max_str). Numeric/temporal min-max land in min_num/
    * max_num (timestamps as epoch MICROS — integer-valued doubles,
    * exact to 2^53, so no float-rounding ambiguity against an external
    * oracle); strings land in min_str/max_str. `relErr` is the gate on
    * |approx - exact| / exact for the HLL++ estimate (its standard
    * error at the default precision is ~2.3%). */
  def profile(df: DataFrame, cols: Seq[String], relErr: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    // duplicate entries would mint duplicate __null_c/__and_c/... aliases
    // and make the later col("__null_$c") references ambiguous, failing
    // deep in analysis with an unhelpful error (ADVICE r9)
    require(cols.distinct.size == cols.size,
      s"duplicate columns in profile: ${cols.diff(cols.distinct).distinct.mkString(", ")}")
    val schema = df.schema
    def isNum(c: String) = schema(c).dataType.isInstanceOf[NumericType]
    def isTime(c: String) = schema(c).dataType match {
      case TimestampType | TimestampNTZType | DateType => true
      case _ => false
    }
    // numeric view used for min/max: numbers as themselves, timestamps
    // as epoch micros (same total order as the native type; exact)
    def numView(c: String): Column = schema(c).dataType match {
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType)).cast("double")
      case TimestampType => unix_micros(col(c)).cast("double")
      case DateType => (unix_date(col(c)).cast("long") * lit(86400000000L)).cast("double")
      case _ => col(c).cast("double")
    }

    // Pass A — sketches + simple stats, NO exact distinct: one
    // Expand-free aggregate whose buffers are a fixed few KB total.
    // Pass B — the exact count(DISTINCT)s alone. Mixing them in one
    // agg is a scale trap: multi-distinct plans Expand and re-key the
    // partial aggregate on (gid, value), and EVERY one of those hash
    // entries would then carry all the non-distinct buffers — columns
    // × 16 KB of HLL++ registers per distinct value (measured OOM at
    // sf0.01 on a 4 GB heap). Split, each pass's buffers are sane; the
    // two 1-row results broadcast-join for free.
    val statAggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val base = Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        // rsd 1% against the 5% default gate = a 5-sigma margin: the
        // (deterministic) estimate for a given dataset can't sit on
        // the wrong side of the gate by estimator noise
        approx_count_distinct(col(c), 0.01).as(s"__and_$c"))
      val minmax =
        if (isNum(c) || isTime(c)) Seq(
          min(numView(c)).as(s"__minn_$c"),
          max(numView(c)).as(s"__maxn_$c"),
          lit(null).cast("string").as(s"__mins_$c"),
          lit(null).cast("string").as(s"__maxs_$c"))
        else Seq(
          lit(null).cast("double").as(s"__minn_$c"),
          lit(null).cast("double").as(s"__maxn_$c"),
          min(col(c)).cast("string").as(s"__mins_$c"),
          max(col(c)).cast("string").as(s"__maxs_$c"))
      base ++ minmax
    }
    val exactAggs: Seq[Column] =
      cols.map(c => count_distinct(col(c)).as(s"__nd_$c"))
    val one = df.agg(statAggs.head, statAggs.tail: _*)
      .crossJoin(broadcast(df.agg(exactAggs.head, exactAggs.tail: _*)))

    // unpivot the single stats row to long format (driver never sees
    // the data — this is a 1-row transform)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n"),
        col(s"__null_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        (abs(col(s"__and_$c").cast("double") - col(s"__nd_$c").cast("double"))
          <= lit(relErr) * col(s"__nd_$c").cast("double")).as("approx_ok"),
        col(s"__minn_$c").as("min_num"),
        col(s"__maxn_$c").as("max_num"),
        col(s"__mins_$c").as("min_str"),
        col(s"__maxs_$c").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
      .orderBy("col_name")
  }

  /** Mergeable count-min buffer: `depth` rows of `width` counters,
    * flattened row-major, plus the total item count. */
  final case class CmsBuf(n: Long, counters: Array[Long]) extends Serializable

  /**
   * Count-min sketch (Cormode & Muthukrishnan 2005) over a string-array
   * column — frequency estimation in FIXED memory where the exact
   * groupBy's key space (every distinct n-gram at 100 TB) would not
   * fit anywhere. `estimate(g) = min_j counter[j][h_j(g)]` never
   * undercounts and overcounts by at most εN with the usual
   * (depth, width) guarantees.
   *
   * Same one-pass discipline as [[graft.operators.GramAgg]]: the
   * buffer is depth×width longs per task, reduce walks the row's
   * array, merge is element-wise add — the exchange carries one
   * fixed-size sketch per map task and nothing gram-shaped. The hash
   * is the repo's cross-engine md5-bucket rule on `"$j_$gram"`, so an
   * external engine can rebuild the IDENTICAL counters from the same
   * corpus (the q185 oracle does).
   */
  class CmsAgg(depth: Int, width: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Seq[String], CmsBuf, CmsBuf]
      with Serializable {
    require(depth >= 1 && depth <= 4,
      "depth in [1, 4]: the rows are disjoint 8-hex slices of ONE md5")
    require(width >= 1, "width must be >= 1")

    override def zero: CmsBuf = CmsBuf(0L, new Array[Long](depth * width))

    override def reduce(buf: CmsBuf, xs: Seq[String]): CmsBuf = {
      if (xs != null) {
        val md = java.security.MessageDigest.getInstance("MD5")
        val it = xs.iterator
        var n = 0L
        while (it.hasNext) {
          val g = it.next()
          md.reset()
          val d = md.digest(g.getBytes("UTF-8"))
          var j = 0
          while (j < depth) {
            buf.counters(j * width + Cms.sliceBucket(d, j, width)) += 1L
            j += 1
          }
          n += 1L
        }
        CmsBuf(buf.n + n, buf.counters)
      } else buf
    }

    override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
      var k = 0
      while (k < a.counters.length) { a.counters(k) += b.counters(k); k += 1 }
      CmsBuf(a.n + b.n, a.counters)
    }

    override def finish(buf: CmsBuf): CmsBuf = buf
    override def bufferEncoder: org.apache.spark.sql.Encoder[CmsBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CmsBuf]()
    override def outputEncoder: org.apache.spark.sql.Encoder[CmsBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CmsBuf]()
  }

  object Cms {
    /** Hash row j = md5(g)'s j-th disjoint 8-hex slice (bytes 4j..4j+3)
      * as a long, mod width — ONE digest serves all four rows, and the
      * rule stays cross-engine:
      * `CAST('0x'||substring(md5(g), 1+8*j, 8) AS BIGINT) % width`. */
    def sliceBucket(digest: Array[Byte], j: Int, width: Int): Int = {
      var v = 0L
      var b = 4 * j
      while (b < 4 * j + 4) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
      (v % width).toInt
    }

    /** [[sliceBucket]] from the gram string. */
    def bucket(j: Int, g: String, width: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      sliceBucket(md.digest(g.getBytes("UTF-8")), j, width)
    }

    /** The column-level sketch as one {n, counters} struct. */
    def cms_sketch(grams: Column, depth: Int, width: Int): Column =
      udaf(new CmsAgg(depth, width),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]())(grams)

    /** Point estimate from a collected sketch. */
    def estimate(counters: Array[Long], depth: Int, width: Int, g: String): Long = {
      var best = Long.MaxValue
      var j = 0
      while (j < depth) {
        val c = counters(j * width + bucket(j, g, width))
        if (c < best) best = c
        j += 1
      }
      best
    }

    /** Frozen-sketch boilerplate scoring — the streaming side of the
      * CMS: a sketch built once over the reference corpus rides a
      * broadcast, and each incoming row is scored scan-side by the
      * fraction of its grams whose estimated document frequency clears
      * `minCount`. Zero state on the stream (the KN/DSIR
      * frozen-artifact discipline): batch and streaming scores are
      * identical by construction. Returns a
      * {n_grams, n_heavy} struct column. */
    def heavyStats(
        spark: org.apache.spark.sql.SparkSession,
        counters: Array[Long], depth: Int, width: Int, minCount: Long,
        grams: Column): Column = {
      require(counters.length == depth * width, "sketch shape mismatch")
      val bc = spark.sparkContext.broadcast(counters)
      val f = udf { (gs: Seq[String]) =>
        val cs = bc.value
        var heavy = 0
        var n = 0
        if (gs != null) {
          val md = java.security.MessageDigest.getInstance("MD5")
          val it = gs.iterator
          while (it.hasNext) {
            val g = it.next()
            md.reset()
            val d = md.digest(g.getBytes("UTF-8"))
            var best = Long.MaxValue
            var j = 0
            while (j < depth) {
              val c = cs(j * width + sliceBucket(d, j, width))
              if (c < best) best = c
              j += 1
            }
            if (best >= minCount) heavy += 1
            n += 1
          }
        }
        (n, heavy)
      }
      f(grams).cast("struct<n_grams:int,n_heavy:int>")
    }
  }
}
