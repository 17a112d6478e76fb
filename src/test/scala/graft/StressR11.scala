package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-11 scale stress — the VERDICT-r10 asks:
 *
 *  1. Containment dedup over 500k docs with 5k PLANTED prefix
 *     excerpts: tokens are doc-unique so organic containment is
 *     impossible, and every excerpt is the first half of its source —
 *     the pair count must be EXACTLY 5000 (all in the excerpt ->
 *     source direction, C = 1.0). Inverted-index pruned, no
 *     all-pairs anywhere.
 *  2. Encoder-block (q127 model) and LSTM (q124 model) inference over
 *     500k 12-token rows: per-row-bounded attention/recurrence,
 *     batched mapPartitions; class mix sanity-checked.
 *  3. Batch IVFADC with the round-11 query-side hot-cell split forced
 *     at volume (100k codes, 10k queries, maxQueriesPerCell=256):
 *     executed (cell, block) cogroups must exceed nlist — the
 *     parallelism cap the split lifts — and every query must land its
 *     full top-5.
 *
 * Run: SPARK_DRIVER_MEM=28g sbt "Test/runMain graft.StressR11"
 */
object StressR11 {

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

    // ---- 1. containment dedup: 500k docs, 5k planted excerpts ----
    // doc-unique tokens (w<doc>_<i>) -> zero organic shingle overlap;
    // excerpts (id + 10M) carry the source's first 30 of 60 tokens
    val base = spark.range(500000L).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(59)),
        i => concat(lit("w"), col("id"), lit("_"), i)), " ").as("text"))
    val excerpts = spark.range(5000L).select((col("id") + 10000000L).as("doc_id"),
      array_join(transform(sequence(lit(0), lit(29)),
        i => concat(lit("w"), col("id"), lit("_"), i)), " ").as("text"))
    val pairs = timed("containmentPairs 505k docs (5k planted prefixes)") {
      operators.Dedup.containmentPairs(base.unionByName(excerpts),
          "doc_id", "text", n = 3, threshold = 0.9)
        .select("contained", "container").collect()
    }
    require(pairs.length == 5000, s"expected exactly 5000 pairs, got ${pairs.length}")
    require(pairs.forall(r => r.getLong(0) == r.getLong(1) + 10000000L),
      "a pair was not excerpt -> its own source")
    println(s"[stress] containment: ${pairs.length} pairs, all excerpt->source")

    // ---- 2. encoder + LSTM heads at 500k rows ----
    val toks = spark.range(500000L).select(col("id").as("doc_id"),
      transform(sequence(lit(0), lit(11)),
        i => pmod(col("id") * 131L + i * 37L, lit(32L))).as("tok_ids"))
    graft.functions.ArgMax.register(spark)
    val encBc = spark.sparkContext.broadcast(SparkEntry.encModel)
    val encCounts = timed("encoder-block inference 500k x 12 tokens") {
      graft.torch.Torch.inferBatched(toks, "tok_ids", "logits", encBc, batchSize = 256)
        .select(call_function("argmax", col("logits")).as("c"))
        .groupBy("c").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    println(s"[stress] encoder classes: $encCounts")
    require(encCounts.values.sum == 500000L && encCounts.size >= 2,
      s"encoder degenerate at volume: $encCounts")
    val lstmBc = spark.sparkContext.broadcast(SparkEntry.lstmModel)
    val lstmCounts = timed("LSTM inference 500k x 12 tokens") {
      graft.torch.Torch.inferBatched(toks, "tok_ids", "logits", lstmBc, batchSize = 256)
        .select(call_function("argmax", col("logits")).as("c"))
        .groupBy("c").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    println(s"[stress] lstm classes: $lstmCounts")
    require(lstmCounts.values.sum == 500000L && lstmCounts.size >= 2,
      s"lstm degenerate at volume: $lstmCounts")

    // ---- 3. batch IVFADC, hot-cell split forced at volume ----
    val emb = spark.range(100000L).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => sin(col("id") * 0.137 + j * 0.61) + sin(col("id") % 16 * 1.7 + j)).as("embedding"))
    val ix = timed("ivfPqTrain 100k x 64d") {
      operators.Similarity.ivfPqTrain(emb, "embedding", dim = 64, nlist = 16, m = 8, ksub = 32)
    }
    val codes = operators.Similarity.ivfPqEncode(emb, "vec_id", "embedding", ix)
    val qs = emb.filter(col("vec_id") % 10 === 0) // 10k queries: the batch shape
    val nRows = timed("ivfPqTopKBatch 10k queries x 100k codes (forced split)") {
      operators.Similarity.ivfPqTopKBatch(codes, qs, "vec_id", "embedding", ix,
        k = 5, nprobe = 4, maxQueriesPerCell = 256).count()
    }
    val groups = operators.Similarity.lastBatchGroups.value
    println(s"[stress] batch ANN: rows=$nRows cogroups=$groups (nlist=16)")
    require(nRows == 10000L * 5, s"a query lost part of its top-5: $nRows rows")
    require(groups > 16, s"hot-cell split did not engage at volume: $groups groups")

    // ---- 4. bidirectional GRU at 500k rows (two scans per row) ----
    val biBc = spark.sparkContext.broadcast(SparkEntry.biGruModel)
    val biCounts = timed("BiGRU inference 500k x 12 tokens") {
      graft.torch.Torch.inferBatched(toks, "tok_ids", "logits", biBc, batchSize = 256)
        .select(call_function("argmax", col("logits")).as("c"))
        .groupBy("c").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    println(s"[stress] bigru classes: $biCounts")
    require(biCounts.values.sum == 500000L && biCounts.size >= 2,
      s"bigru degenerate at volume: $biCounts")

    // ---- 5. centroid probe at 1M vectors: label geometry planted ----
    // vector = label-anchored base + per-id jitter an order smaller, so
    // the nearest-centroid assignment must recover EVERY label; the
    // centroid pass must stay a partial agg (no data-sized shuffle)
    val labeled = spark.range(1000000L).select(col("id").as("vec_id"),
      (col("id") % 10).cast("int").as("label"),
      transform(sequence(lit(0), lit(63)),
        j => sin(col("id") % 10 * 2.3 + j * 0.7) +
          sin(col("id") * 0.917 + j) * 0.05).as("embedding"))
    val conf = timed("centroidClassify 1M x 64d, 10 labels") {
      operators.Similarity.centroidClassify(labeled, "vec_id", "embedding", "label")
        .groupBy("label", "pred").count().collect()
    }
    val correct = conf.filter(r => r.getInt(0) == r.getInt(1)).map(_.getLong(2)).sum
    println(s"[stress] centroid probe: ${correct}/1000000 correct, ${conf.length} confusion cells")
    require(correct == 1000000L,
      s"planted label geometry not recovered: $correct/1000000")

    // ---- 6. Aho-Corasick at blocklist scale: 10k patterns, 500k docs ----
    // patterns pN_a..pN_c over a synthetic alphabet; docs embed exactly
    // one known pattern each (id % 10k) inside doc-unique filler, so
    // the expected match total is exactly 500k and each hit is
    // attributable. ONE automaton pass per doc regardless of P.
    val patterns = (0 until 10000).map(i => s"p${i}_a p${i}_b p${i}_c")
    val blDocs = spark.range(500000L).select(col("id").as("doc_id"),
      concat_ws(" ",
        concat(lit("f"), col("id"), lit("_x f"), col("id"), lit("_y")),
        concat(lit("p"), col("id") % 10000, lit("_a p"), col("id") % 10000,
          lit("_b p"), col("id") % 10000, lit("_c")),
        concat(lit("f"), col("id"), lit("_z"))).as("text"))
    val blHits = timed("Blocklist.matches 500k docs x 10k patterns") {
      operators.Blocklist.matches(blDocs, "doc_id", "text", patterns)
        .select(col("doc_id"), col("pattern")).collect()
    }
    require(blHits.length == 500000, s"expected exactly 500k hits, got ${blHits.length}")
    require(blHits.forall(r => r.getString(1) == s"p${r.getLong(0) % 10000}_a " +
      s"p${r.getLong(0) % 10000}_b p${r.getLong(0) % 10000}_c"),
      "a hit did not match its planted pattern")
    println(s"[stress] blocklist: ${blHits.length} hits, all planted-pattern-exact")

    // ---- 7. PageRank over a 10k-word vocabulary graph from 500k docs ----
    // token stream cycles a 10k-word vocabulary with an id-dependent
    // stride, giving a dense transition graph; the rank loop runs over
    // the 10k-node set while edge extraction scans 500k x 40 words
    val prDocs = spark.range(500000L).select(
      array_join(transform(sequence(lit(0), lit(39)),
        i => concat(lit("w"), pmod(col("id") * 7L + i * (col("id") % 13L + 1L),
          lit(10000L)))), " ").as("text"))
    val ranks = timed("PageRank 500k docs -> 10k-node graph, 10 iterations") {
      operators.Rank.weightedPageRank(
        operators.Rank.bigramEdges(prDocs, "text"), 0.85, 10).collect()
    }
    require(ranks.length == 10000, s"node set ${ranks.length} != 10000")
    val mass = ranks.map(_.getDouble(1)).sum
    require(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass drifted")
    println(f"[stress] pagerank: ${ranks.length} nodes, mass $mass%.9f")

    spark.stop()
  }
}
