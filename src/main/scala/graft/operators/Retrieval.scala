package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sparse/dense hybrid retrieval: Okapi-BM25 keyword scoring, and
 * reciprocal-rank fusion of ranked lists (Cormack et al., SIGIR'09) —
 * the standard way a training-data pipeline marries a keyword index
 * with an embedding ANN index (RAG-style corpus search, labeled-seed
 * expansion, targeted decontamination).
 *
 * Scale shape: per-term tf's are scan-side `filter(tokens, …)` sizes
 * (no explode — a 100-word doc never becomes 100 rows), the corpus
 * stats (N, avgdl, per-term df) are ONE aggregate broadcast back as a
 * scalar row, the candidate set is pre-filtered to docs containing at
 * least one query term before anything ranks, and top-k plans as
 * TakeOrderedAndProject (no global sort at 100 TB). The fusion join
 * touches 2·k rows.
 */
object Retrieval {

  /**
   * Okapi BM25 top-k for one bag-of-terms query, Lucene's idf variant:
   * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`,
   * `score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl))`.
   * Returns `(<idCol>, rank, score)` with rank 1..k by
   * (score DESC, id ASC).
   */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      s"terms must be non-empty and distinct: $terms")
    val toks = docs.select(col(idCol).as("id"),
      call_function("regexp_extract_all", col(textCol),
        lit(graft.Tok.Pattern), lit(0)).as("toks"))
      .withColumn("dl", size(col("toks")))
    val withTf = terms.zipWithIndex.foldLeft(toks) { case (df, (t, i)) =>
      df.withColumn(s"tf$i", size(filter(col("toks"), x => x === lit(t))))
    }.drop("toks")
    // one corpus pass -> a single scalar row, broadcast to the candidates
    val stats = withTf.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i")): _*)
    val cand = withTf
      .filter(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      // tf = 0 contributes exactly 0 (numerator 0, denominator > 0)
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    val top = cand.withColumn("score", score)
      .select("id", "score")
      .orderBy(col("score").desc, col("id"))
      .limit(k) // TakeOrderedAndProject: no global sort
    // rank over the <= k surviving rows only
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("id"))).cast("int"))
      .select(col("id").as(idCol), col("rank"), col("score"))
  }

  /** Frozen corpus-side BM25 statistics: doc count, average doc
    * length, per-query-term document frequencies (aligned with the
    * `terms` they were computed for). */
  final case class Bm25Stats(nDocs: Double, avgdl: Double, dfs: IndexedSeq[Double])

  /** One corpus pass -> the frozen stats for `terms` (a 1-row collect;
    * the standing-corpus side of streaming ingest scoring). */
  def corpusStats(docs: DataFrame, textCol: String, terms: Seq[String]): Bm25Stats = {
    val toks = docs.select(
      call_function("regexp_extract_all", col(textCol),
        lit(graft.Tok.Pattern), lit(0)).as("toks"))
      .withColumn("dl", size(col("toks")))
    val r = terms.zipWithIndex.foldLeft(toks) { case (df, (t, i)) =>
      df.withColumn(s"tf$i", size(filter(col("toks"), x => x === lit(t))))
    }.agg(
      count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i")): _*)
      .collect().head
    Bm25Stats(r.getDouble(0), r.getDouble(1),
      terms.indices.map(i => r.getDouble(2 + i)).toIndexedSeq)
  }

  /**
   * BM25 scoring against FROZEN stats — the streaming-ingest form
   * (the frozen-quantizer discipline: the standing corpus defines N /
   * avgdl / df as literals, each arriving doc is scored scan-side
   * with ZERO streaming state, so relevance routing runs at line
   * rate on an unbounded stream). Identical arithmetic to
   * [[bm25TopK]], so a batch re-score with the same frozen stats is
   * equal row-for-row (spec-pinned in DocStreamSpec). Works on batch
   * and streaming frames alike; appends `outCol`.
   */
  def withBm25Frozen(
      df: DataFrame,
      textCol: String,
      terms: Seq[String],
      stats: Bm25Stats,
      outCol: String = "bm25",
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "withBm25Frozen: empty terms")
    require(stats.dfs.length == terms.length, "stats/terms length mismatch")
    val toksCol = call_function("regexp_extract_all", col(textCol),
      lit(graft.Tok.Pattern), lit(0))
    val dl = size(toksCol).cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(toksCol, x => x === lit(t))).cast("double")
      // StrictMath.log, not math.log: Spark's log() expression runs
      // StrictMath (platform-pinned), and matching it makes this frozen
      // literal BIT-EQUAL to bm25TopK's in-plan idf on the same corpus
      // (java.lang.Math.log may differ by 1 ulp)
      val idf = StrictMath.log(1.0 +
        (stats.nDocs - stats.dfs(i) + 0.5) / (stats.dfs(i) + 0.5))
      lit(idf) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(stats.avgdl)))
    }.reduce(_ + _)
    df.withColumn(outCol, score)
  }

  /**
   * Reciprocal-rank fusion of two ranked lists (full outer on id):
   * `rrf = Σ_lists 1/(kRrf + rank)`, a missing entry contributing 0 —
   * rank-only, so the fused score is bit-exact across engines
   * regardless of how the underlying scores drift. Returns the top-k
   * ids by (rrf DESC, id ASC) with both source ranks carried (null
   * when absent).
   */
  def rrfFuse(
      a: DataFrame, rankA: String,
      b: DataFrame, rankB: String,
      idCol: String,
      k: Int,
      kRrf: Int = 60): DataFrame = {
    def contrib(c: Column): Column =
      coalesce(lit(1.0) / (lit(kRrf.toDouble) + c.cast("double")), lit(0.0))
    a.select(col(idCol), col(rankA)).join(
        b.select(col(idCol), col(rankB)), Seq(idCol), "full_outer")
      .withColumn("rrf", contrib(col(rankA)) + contrib(col(rankB)))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** ColBERT-style MaxSim LATE-INTERACTION retrieval (Khattab &
    * Zaharia 2020): score(doc) = Σ over query tokens of the MAX over
    * doc tokens of cos(E[q], E[t]) — per-token matching that a single
    * pooled vector cannot express (a doc mentioning every query term
    * once beats a doc repeating one term). Scan-side: the token
    * embedding table and the query-term ids ride ONE broadcast, each
    * doc scores in O(|doc| · |query| · dim) with no shuffle, and the
    * top-k short-circuits through orderBy+limit
    * (TakeOrderedAndProject) — the 100 TB shape. With a DYADIC
    * embedding table every cosine is bit-identical cross-engine
    * (exact f64 dots/norms, correctly-rounded sqrt/divide), so only
    * the final score quantizes (6 dp) for the gate.
    *
    * @return top-k (idCol, maxsim) by (score DESC, id) */
  def maxSimTopK(df: DataFrame, idCol: String, tokCol: String,
      emb: Array[Array[Float]], queryIds: Seq[Int], k: Int): DataFrame = {
    require(queryIds.nonEmpty && queryIds.forall(q => q >= 0 && q < emb.length),
      "query ids must index the embedding table")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(
      (emb.map(_.map(_.toDouble)), queryIds.toArray))
    val score = udf { toks: Seq[Int] =>
      val (tab, qs) = bc.value
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var j = 0
        while (j < a.length) {
          dot += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1
        }
        // dot / (sqrt(na) * sqrt(nb)) — the exact op shape the oracle
        // restates (NOT sqrt(na*nb): different rounding)
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      var s = 0.0
      var qi = 0
      while (qi < qs.length) {
        val qe = tab(qs(qi))
        var best = Double.NegativeInfinity
        var ti = 0
        while (ti < toks.length) {
          val c = cos(tab(toks(ti)), qe)
          if (c > best) best = c
          ti += 1
        }
        s += best // query-term order — the oracle's m1 + m2 + ... sum
        qi += 1
      }
      BigDecimal(s).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    df.filter(size(col(tokCol)) > 0)
      .select(col(idCol), score(col(tokCol)).as("maxsim"))
      .orderBy(col("maxsim").desc, col(idCol))
      .limit(k)
  }

  /**
   * MaxSim over an ANN SHORTLIST (q233) — the way ColBERT actually
   * deploys (Khattab & Zaharia 2020 §3.6): candidate generation runs
   * in TOKEN space, not pooled-doc space — for each query term, the
   * IVFADC index over the token-embedding table retrieves the `r`
   * nearest token embeddings; docs containing ANY retrieved token are
   * the shortlist, and the late-interaction [[maxSimTopK]] arithmetic
   * reranks ONLY those (identical scores, so whenever the true top-k
   * survives stage 1 the result equals the full scan row-for-row — a
   * pooled single-vector proxy does NOT have that property: measured
   * here, maxsim-3.0 winners ranked 67-489 of 500 by pooled cosine).
   *
   * Scale shape: the token-space search touches the VOCABULARY-sized
   * index (ColBERT's billion-token centroid index — here the table
   * itself), never the corpus; the retrieved token ids are bounded by
   * construction (<= |queryIds|·r <= vocab), travel as a literal
   * in-filter on the scan (`arrays_overlap` — scan-side, no shuffle,
   * no explode), and only shortlist docs pay the O(|doc|·|q|·d)
   * MaxSim. Every stage is seeded/deterministic.
   */
  def maxSimTopKAnn(df: DataFrame, idCol: String, tokCol: String,
      emb: Array[Array[Float]], queryIds: Seq[Int], k: Int,
      r: Int, nlist: Int, m: Int, ksub: Int, nprobe: Int): DataFrame = {
    require(r >= 1 && r <= emb.length, "r must be in [1, vocab]")
    val spark = df.sparkSession
    val dim = emb.head.length
    import spark.implicits._
    val tokVecs = emb.indices
      .map(t => (t.toLong, emb(t).map(_.toDouble).toSeq))
      .toDF("tok_id", "embedding")
    val ix = Similarity.ivfPqTrain(tokVecs, "embedding", dim, nlist, m, ksub)
    val codes = Similarity.ivfPqEncode(tokVecs, "tok_id", "embedding", ix)
    // query-term vectors under DISJOINT synthetic ids (the search
    // excludes vec_id == q_id self-pairs; terms must keep their own
    // token as a candidate — its cosine is exactly 1)
    val qDf = queryIds.zipWithIndex
      .map { case (q, i) => (emb.length.toLong + i,
        emb(q).map(_.toDouble).toSeq) }
      .toDF("tok_id", "embedding")
    val near = Similarity.ivfPqTopKReranked(tokVecs, codes, qDf,
      "tok_id", "embedding", ix, k = r, shortlist = r, nprobe = nprobe)
    // bounded by construction: <= |queryIds| * r <= vocab ids
    val candToks = near.select(col("vec_id").cast("int"))
      .distinct().collect().map(_.getInt(0)).sorted
    maxSimTopK(
      df.filter(size(col(tokCol)) > 0)
        .filter(arrays_overlap(col(tokCol),
          array(candToks.map(lit(_)).toIndexedSeq: _*))),
      idCol, tokCol, emb, queryIds, k)
  }
}
