package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-9 scale stress for the corpus-monitoring operators:
 *
 *  1. Content-defined chunking (q120's Chunk.chunkByContent) over a
 *     20×-sf0.1 synthetic corpus (100k docs, ~200 words each, ~20M
 *     words total). The whole computation is a scan-side HOF — the
 *     check is throughput plus exact reconstruction: total chunk
 *     tokens must equal total corpus tokens (no word lost or
 *     duplicated at any boundary), and re-running on a corpus with
 *     one word inserted into every doc must change only ~1 chunk per
 *     doc (insertion locality at scale).
 *
 *  2. VecStatsAgg (q118) over 2M 64-d vectors in 16 groups: the
 *     mergeable buffer means the exchange carries (tasks × groups)
 *     small structs, not 128M element-rows. Checked against the
 *     closed-form moments of the generator.
 *
 *  3. Profile (q117) over a 20M-row two-pass profile: the stats pass
 *     must stay Expand-free while exact distincts run separately —
 *     wall-clock is the check that the split shape holds at volume.
 *
 * Run: SPARK_DRIVER_MEM=16g sbt "Test/runMain graft.StressR9"
 */
object StressR9 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ---- 1. CDC chunking at 20x ----
    // deterministic ~200-word docs: word w<k> with k spread over a 5k
    // vocabulary so boundary words (hash % 64 == 0) appear naturally
    val docs = spark.range(100000L).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(199)),
        i => concat(lit("w"), pmod(col("id") * 131L + i * 7919L, lit(5000L)))), " ")
        .as("text"))
      .cache()
    val nDocs = docs.count()
    val totalWords = nDocs * 200L

    val chunks = timed("chunkByContent 100k docs / 20M words") {
      val c = operators.Chunk.chunkByContent(docs, "doc_id", "text", 64)
        .agg(count(lit(1)).as("n_chunks"), sum("chunk_tokens").as("n_tokens"))
        .collect().head
      c
    }
    println(s"[stress] cdc: chunks=${chunks.getLong(0)} tokens=${chunks.getLong(1)}")
    require(chunks.getLong(1) == totalWords,
      s"reconstruction lost words: ${chunks.getLong(1)} vs $totalWords")

    // insertion locality: add one NON-boundary word mid-doc everywhere;
    // chunk count may only change where the word landed (never ripples)
    val before = operators.Chunk.chunkByContent(docs, "doc_id", "text", 64)
      .groupBy("doc_id").agg(count(lit(1)).as("nc"))
    val edited = docs.select(col("doc_id"),
      concat(
        array_join(slice(split(col("text"), " "), 1, 100), " "),
        lit(" w1 "), // hash("w1") % 64 != 0 — a non-boundary filler
        array_join(slice(split(col("text"), " "), 101, 100), " ")).as("text"))
    val after = operators.Chunk.chunkByContent(edited, "doc_id", "text", 64)
      .groupBy("doc_id").agg(count(lit(1)).as("nc2"))
    val changed = timed("cdc insertion-locality diff over 100k docs") {
      before.join(after, "doc_id").filter(col("nc") =!= col("nc2")).count()
    }
    println(s"[stress] cdc: docs with changed CHUNK COUNT after 1 insertion = $changed")
    require(changed == 0, s"non-boundary insertion changed chunk counts in $changed docs")

    // ---- 2. VecStatsAgg over 2M x 64 ----
    val dim = 64
    val vecs = spark.range(2000000L).select(
      pmod(col("id"), lit(16)).as("g"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(col("id") * 37L + j * 101L, lit(1000L)).cast("double") / 1000.0)
          .cast("float")).as("vec"))
    val stats = timed("vec_stats 2M x 64-d, 16 groups") {
      vecs.groupBy("g")
        .agg(functions.VecStatsAgg.vec_stats(col("vec"), dim).as("st"))
        .select(col("g"), col("st.n"), col("st.sum"))
        .collect()
    }
    require(stats.length == 16 && stats.map(_.getLong(1)).sum == 2000000L,
      "wrong group count or row total")
    // spot-check one closed-form moment: group g, dim j sums
    // (id*37 + j*101) mod 1000 / 1000 over id ≡ g (mod 16)
    val g0 = stats.find(_.getLong(0) == 3L).get
    // the generator casts each element to FLOAT — mirror that rounding
    // exactly, then the double accumulation agrees to ~1e-10 relative
    val expected = (3L until 2000000L by 16L)
      .map(id => (((id * 37L + 5L * 101L) % 1000L).toDouble / 1000.0).toFloat.toDouble).sum
    val got = g0.getSeq[Double](2)(5)
    require(math.abs(got - expected) < 1e-4, s"moment mismatch: $got vs $expected")
    println(f"[stress] vec_stats moment check ok (dim 5, group 3: $got%.3f)")

    // ---- 3. Profile over 20M rows ----
    val wide = spark.range(20000000L).select(col("id"),
      pmod(col("id"), lit(97L)).as("status"),
      (col("id") % 1000000L).cast("double").as("price"),
      concat(lit("u"), pmod(col("id"), lit(50000L)).cast("string")).as("user"))
    val prof = timed("Profile.profile 20M rows x 4 cols (2-pass)") {
      operators.Profile.profile(wide, Seq("id", "status", "price", "user"))
        .collect()
    }
    require(prof.length == 4)
    val byCol = prof.map(r => r.getString(0) -> r).toMap
    require(byCol("id").getLong(3) == 20000000L, "id distinct wrong")
    require(byCol("status").getLong(3) == 97L, "status distinct wrong")
    require(byCol("user").getLong(3) == 50000L, "user distinct wrong")
    require(prof.forall(_.getBoolean(4)), "an HLL++ estimate missed its gate")
    println("[stress] profile distincts + gates ok")

    spark.stop()
  }
}
