package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-6 scale stress for the new operators, same derived-corpus
 * discipline as the BASELINE.md 20x/100x checks: the sf0.1 tables are
 * unioned N times with per-copy deterministic perturbations that
 * preserve within-copy structure (bijective char rotation for text,
 * dimension permutation for embeddings), so expected results are
 * computable exactly from the construction.
 *
 * Run: SPARK_DRIVER_MEM=16g sbt "Test/runMain graft.StressR6"
 */
object StressR6 {

  private def rotate(df: DataFrame, copies: Int, idCol: String, textCol: String): DataFrame =
    (0 until copies).map { k =>
      val rot = ('a' to 'z').map(c => (((c - 'a') + k) % 26 + 'a').toChar).mkString
      df.select((col(idCol) + lit(k * 1000000L)).as(idCol),
        translate(col(textCol), ('a' to 'z').mkString, rot).as(textCol))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // "100x" arg: 100 rotated doc copies (500k docs), 10M-row shuffle,
    // 100 permuted embedding copies (200k+10k vecs) — the dup-heavy
    // web-crawl-like stress of the round-4/5 records
    val big = args.contains("100x")
    val docCopies = if (big) 100 else 20
    val embCopies = if (big) 100 else 20
    val shuffleRows = if (big) 10000000L else 2000000L

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs20 = rotate(docs, docCopies, "doc_id", "text").cache()
    println(s"[stress] docs20 rows: ${docs20.count()}")

    // ---- BPE train+encode on 100k docs ----
    val (merges, total) = timed(s"bpe train(40)+encode on ${docCopies}x docs") {
      val m = operators.Bpe.train(docs20, "text", numMerges = 40)
      val enc = operators.Bpe.encode(docs20, "text", m)
      val t = enc.agg(sum(size(col("tokens")))).collect()(0).getLong(0)
      (m, t)
    }
    println(s"[stress] bpe merges=${merges.length} total_tokens=$total")

    // ---- bloom decontam: 100k-doc corpus vs ~1k-doc bench slice ----
    val bench = docs20.filter(col("doc_id") % 97 === 3)
    val planted = bench.select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    val corpus = docs20.filter(col("doc_id") % 97 =!= 3).unionByName(planted)
    val flagged = timed(s"bloom decontam ${docCopies}x corpus vs bench slice (+planted copies)") {
      operators.Decontaminate.flagContaminatedBloom(
        corpus, "doc_id", "text", bench, "text", n = 8, minHits = 3).count()
    }
    val nPlanted = planted.count()
    println(s"[stress] bloom flagged=$flagged planted=$nPlanted (flagged >= planted expected)")

    // ---- train shuffle on 2M rows ----
    val bigIds = spark.range(shuffleRows).toDF("id")
    val shardStats = timed(s"trainShuffle $shuffleRows rows, 64 shards") {
      operators.Shuffle.trainShuffle(bigIds, "id", "epoch0", 64)
        .groupBy("shard").agg(count(lit(1)).as("n"), max("pos").as("maxpos"))
        .agg(count(lit(1)), min("n"), max("n"),
          sum(when(col("n") === col("maxpos"), 0).otherwise(1)))
        .collect()(0)
    }
    println(s"[stress] shards=${shardStats.getLong(0)} minN=${shardStats.getLong(1)} " +
      s"maxN=${shardStats.getLong(2)} densityViolations=${shardStats.getLong(3)}")

    // ---- semantic dedup on 40k embeddings + 2k planted twins ----
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val emb20 = (0 until embCopies).map { k =>
      // dimension rotation by k: bijective, preserves within-copy cosine
      val perm = (0 until dim).map(i => (i + k) % dim)
      emb.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
        array(perm.map(i => col("embedding").getItem(i)): _*).as("embedding"))
    }.reduce(_ unionByName _).cache()
    val twins = emb20.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000000L).as("vec_id"),
        transform(col("embedding"), v => v * lit(1.5f)).as("embedding"))
    val nTwins = twins.count()
    val sdCorpus = emb20.unionByName(twins)
    println(s"[stress] semdedup corpus: ${sdCorpus.count()} vecs (twins: $nTwins)")
    val sd = timed(s"semanticDedup ${embCopies}x vecs, k=${if (big) 256 else 64}, t=0.99") {
      val r = operators.Similarity.semanticDedup(
        sdCorpus, "vec_id", "embedding", threshold = 0.99, k = if (big) 256 else 64)
      r.filter(col("dropped")).count()
    }
    println(s"[stress] semdedup dropped=$sd (expected >= $nTwins: every twin has an " +
      "identical-direction original; cross-copy rotations may add more)")

    docs20.unpersist(); emb20.unpersist()
    spark.stop()
  }
}
