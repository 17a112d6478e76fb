package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-10 scale stress: the VERDICT-r9 100× ask for the monitoring
 * operators, plus the round-10 additions at volume.
 *
 *  1. Content-defined chunking over 500k docs / 100M words (100× of
 *     sf0.1's word count): token conservation must hold EXACTLY and a
 *     non-boundary insertion into every doc must change no doc's chunk
 *     count — the same invariants as StressR9, at 5× its corpus.
 *  2. VecStatsAgg over 10M × 64-d vectors (640M elements) in 16
 *     groups: the exchange still carries (tasks × groups) fixed-size
 *     buffers; closed-form moment spot-check.
 *  3. Profile over 50M rows × 4 cols: two bounded passes, stats pass
 *     Expand-free; exact distincts checked.
 *  4. BM25 top-k over 500k docs: one corpus-stats row broadcast, scan-
 *     side tf's, TakeOrderedAndProject — no global sort at volume.
 *  5. GRU inference (q123's model) over 500k token rows: recurrence
 *     cost is per-row-bounded (<= 12 steps), batched mapPartitions.
 *  6. WAV decode + features over 200k payloads (~290M samples through
 *     the real RIFF codec): scan-side, no shuffle.
 *
 * Run: SPARK_DRIVER_MEM=28g sbt "Test/runMain graft.StressR10"
 */
object StressR10 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ---- 1. CDC chunking at 100x (500k docs, 100M words) ----
    val docs = spark.range(500000L).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(199)),
        i => concat(lit("w"), pmod(col("id") * 131L + i * 7919L, lit(5000L)))), " ")
        .as("text"))
    val totalWords = 500000L * 200L
    val chunks = timed("chunkByContent 500k docs / 100M words") {
      operators.Chunk.chunkByContent(docs, "doc_id", "text", 64)
        .agg(count(lit(1)).as("n_chunks"), sum("chunk_tokens").as("n_tokens"))
        .collect().head
    }
    println(s"[stress] cdc: chunks=${chunks.getLong(0)} tokens=${chunks.getLong(1)}")
    require(chunks.getLong(1) == totalWords,
      s"reconstruction lost words: ${chunks.getLong(1)} vs $totalWords")

    val before = operators.Chunk.chunkByContent(docs, "doc_id", "text", 64)
      .groupBy("doc_id").agg(count(lit(1)).as("nc"))
    val edited = docs.select(col("doc_id"),
      concat(
        array_join(slice(split(col("text"), " "), 1, 100), " "),
        lit(" w1 "),
        array_join(slice(split(col("text"), " "), 101, 100), " ")).as("text"))
    val after = operators.Chunk.chunkByContent(edited, "doc_id", "text", 64)
      .groupBy("doc_id").agg(count(lit(1)).as("nc2"))
    val changed = timed("cdc insertion-locality diff over 500k docs") {
      before.join(after, "doc_id").filter(col("nc") =!= col("nc2")).count()
    }
    println(s"[stress] cdc: docs with changed CHUNK COUNT after 1 insertion = $changed")
    require(changed == 0, s"non-boundary insertion changed chunk counts in $changed docs")

    // ---- 2. VecStatsAgg over 10M x 64 ----
    val dim = 64
    val vecs = spark.range(10000000L).select(
      pmod(col("id"), lit(16)).as("g"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(col("id") * 37L + j * 101L, lit(1000L)).cast("double") / 1000.0)
          .cast("float")).as("vec"))
    val stats = timed("vec_stats 10M x 64-d, 16 groups") {
      vecs.groupBy("g")
        .agg(functions.VecStatsAgg.vec_stats(col("vec"), dim).as("st"))
        .select(col("g"), col("st.n"), col("st.sum"))
        .collect()
    }
    require(stats.length == 16 && stats.map(_.getLong(1)).sum == 10000000L,
      "wrong group count or row total")
    val g3 = stats.find(_.getLong(0) == 3L).get
    val expected = (3L until 10000000L by 16L)
      .map(id => (((id * 37L + 5L * 101L) % 1000L).toDouble / 1000.0).toFloat.toDouble).sum
    val got = g3.getSeq[Double](2)(5)
    require(math.abs(got - expected) / expected < 1e-9, s"moment mismatch: $got vs $expected")
    println(f"[stress] vec_stats moment check ok (dim 5, group 3: $got%.3f)")

    // ---- 3. Profile over 50M rows ----
    val wide = spark.range(50000000L).select(col("id"),
      pmod(col("id"), lit(97L)).as("status"),
      (col("id") % 1000000L).cast("double").as("price"),
      concat(lit("u"), pmod(col("id"), lit(50000L)).cast("string")).as("user"))
    val prof = timed("Profile.profile 50M rows x 4 cols (2-pass)") {
      operators.Profile.profile(wide, Seq("id", "status", "price", "user"))
        .collect()
    }
    val byCol = prof.map(r => r.getString(0) -> r).toMap
    require(byCol("id").getLong(3) == 50000000L, "id distinct wrong")
    require(byCol("status").getLong(3) == 97L, "status distinct wrong")
    require(byCol("user").getLong(3) == 50000L, "user distinct wrong")
    require(prof.forall(_.getBoolean(4)), "an HLL++ estimate missed its gate")
    println("[stress] profile distincts + gates ok")

    // ---- 4. BM25 over 500k docs ----
    // plant the rare term in ~0.1% of docs so idf discriminates
    val bmDocs = docs.select(col("doc_id"),
      when(col("doc_id") % 1000 === 0,
        concat(col("text"), lit(" needle"))).otherwise(col("text")).as("text"))
    val top = timed("bm25TopK 500k docs, 3 terms, k=20") {
      operators.Retrieval.bm25TopK(bmDocs, "doc_id", "text",
        Seq("w0", "w777", "needle"), k = 20).collect()
    }
    require(top.length == 20 && top.map(_.getInt(1)).toSeq == (1 to 20),
      "bm25 top-k shape wrong")
    // every winner must contain the planted rare term (idf dominance)
    require(top.forall(_.getLong(0) % 1000 == 0), "needle docs should dominate top-20")
    println(s"[stress] bm25 top-20 ok (all needle docs)")

    // ---- 5. GRU inference over 500k token rows ----
    val m = SparkEntry.gruModel
    val bc = spark.sparkContext.broadcast(m)
    val toks = spark.range(500000L).select(col("id"),
      transform(sequence(lit(0), lit(11)),
        i => pmod(col("id") * 7L + i * 13L, lit(32L)).cast("int")).as("tok_ids"))
    val inf = timed("GRU forward 500k x 12-token rows") {
      graft.torch.Torch.inferBatched(toks, "tok_ids", "logits", bc, batchSize = 1024)
        .agg(sum(element_at(col("logits"), 1))).collect().head.getDouble(0)
    }
    require(!inf.isNaN, "GRU inference produced NaN")
    println(f"[stress] gru logit sum = $inf%.2f")

    // ---- 6. WAV codec over 200k payloads ----
    val wavUdf = udf((id: Long) => {
      val n = (1200 + (id % 5) * 60).toInt
      operators.Audio.writeWavPcm16(8000,
        Array(Array.tabulate(n)(i => (((id * 31 + i.toLong * 7) % 4096) - 2048).toShort)))
    })
    val wavs = spark.range(200000L).select(col("id"), wavUdf(col("id")).as("wav"))
    val af = timed("WAV decode + features 200k payloads (~264M samples)") {
      operators.Audio.withWavFeatures(wavs, "wav", "af")
        .agg(sum("af.n_samples"), min("af.rms"), max("af.peak")).collect().head
    }
    val nSamples = af.getLong(0)
    require(nSamples == (0L until 200000L).map(id => 1200 + (id % 5) * 60).sum,
      s"sample count wrong: $nSamples")
    println(s"[stress] wav: total samples=$nSamples rms_min=${af.getDouble(1)} peak_max=${af.getDouble(2)}")

    // ---- 7. ResNet vision inference over 300k images ----
    // synth PGM -> real PixelDecoder -> stem+residual block (q131's
    // model): the conv stack is per-row-bounded (8x8), scan-side
    val resBc = spark.sparkContext.broadcast(SparkEntry.resnetModel)
    val pgm = udf((id: Long) => {
      val header = "P5\n8 8\n255\n".getBytes("US-ASCII")
      header ++ Array.tabulate(64)(i =>
        (((id * 1099511627791L) ^ ((i / 8) * 52501L + (i % 8) * 8191L +
          id * 6007L)) % 256).toByte)
    })
    val imgs = operators.Multimodal.resizeImage(
      spark.range(300000L).select(col("id"), pgm(col("id")).as("img")),
      "img", "px", 8, 8)
    val vis = timed("PGM decode + ResNet forward 300k images") {
      graft.torch.Torch.inferImageBatched(
          imgs.select(col("id"), col("px.pixels").as("pixels")),
          "pixels", "logits", resBc, c = 1, h = 8, w = 8, batchSize = 1024)
        .agg(sum(element_at(col("logits"), 1))).collect().head.getDouble(0)
    }
    require(!vis.isNaN, "resnet inference produced NaN")
    println(f"[stress] resnet logit sum = $vis%.2f")

    spark.stop()
  }
}
