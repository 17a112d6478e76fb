package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, each designed
 * around one shuffle discipline:
 *
 *  - exact dedup: one hash-aggregate on the key (no sort);
 *  - n-gram Jaccard: inverted-index self-join on shingles — pairs are
 *    only generated for docs sharing >=1 shingle, never a cross join;
 *  - MinHash-LSH: banded signatures bucket the join, candidates are
 *    exact-verified, so output == brute force whenever band recall
 *    holds (tunable bands/rows), at a fraction of the pairs;
 *  - SimHash: 64-bit fingerprints, near-pairs via pigeonhole banding
 *    on 16-bit chunks + popcount verify.
 *
 * All-pairs work never materializes O(N^2): every join is keyed
 * (shingle, band, or chunk), which is what survives a 100x scale-up.
 *
 * Cache lifecycle: the pair operators lazily `localCheckpoint` their
 * narrow signature/index intermediates, because self-join aliases
 * defeat Spark's exchange reuse — otherwise the corpus scan +
 * signature pass runs once per join side. Unlike `persist` (whose
 * CacheManager entry lives until an explicit unpersist), checkpoint
 * blocks are freed by the ContextCleaner once the returned DataFrame
 * is no longer referenced, so repeated calls do not accumulate
 * session-lifetime cache. Standard localCheckpoint caveat: blocks
 * live on executors, so losing an executor (dynamic allocation)
 * fails the job — use a stable pool for long dedup runs, or set
 * `spark.graft.checkpoint.dir` to switch every operator checkpoint
 * to a reliable FS-backed one (see [[Checkpoints]]).
 */
object Dedup {

  /** Exact dedup: keep, per key, the row with the smallest `orderCol`.
    * One shuffle on the key columns (window, no pre-sort needed at the
    * API level; AQE handles skew). */
  def firstPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exploded distinct (id, shingle) pairs — the inverted-index input. */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.Shingles.shingles(df.sparkSession, col(textCol), n)).as("shingle"))

  /** [[shingleIndex]] with 8-byte hashed shingles — same distinct-set
    * cardinalities modulo ~2^-64 collisions, and the inverted-index
    * shuffle moves longs instead of multi-word strings. */
  def shingleHashIndex(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.ShingleHashes.shingle_hashes(df.sparkSession, col(textCol), n))
        .as("shingle"))

  /**
   * Exact n-gram-set Jaccard similarity pairs with jaccard >= threshold.
   * Output columns: (a, b, jaccard), a < b.
   *
   * Plan shape: explode shingles -> self-join keyed on the shingle
   * (shuffle hash join on a high-cardinality key) -> count intersections
   * per pair -> join the per-doc set sizes.
   *
   * `maxDocFreq`, when set, drops shingles appearing in more than that
   * many docs (stop-shingle pruning — the standard scale lever; default
   * off). SEMANTICS: both the intersection counts AND the per-doc set
   * sizes then come from the pruned index, so the reported value is the
   * exact Jaccard over the PRUNED shingle space — internally consistent,
   * but it can be above or below the unpruned-space Jaccard (pruned
   * shingles are by construction ones shared across many docs, so
   * typically it is lower). Pinned by the tight-cap case in DedupSpec.
   */
  /** Shared exact-pair machinery: the (possibly df-pruned) hashed
    * shingle index reduced to per-pair intersection counts + per-doc
    * distinct-shingle sizes. Both the symmetric (Jaccard) and
    * asymmetric (containment) rules divide these. */
  private def intersectionCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxDocFreq: Option[Int]): (DataFrame, DataFrame) = {
    val idx0 = shingleHashIndex(df, idCol, textCol, n)
    val idx = maxDocFreq match {
      case Some(m) =>
        // checkpointed: the doc-frequency aggregate AND the join back
        // both consume it — unpersisted, the tokenize/hash/explode
        // stage would run twice before pruning even starts
        val idxC = idx0.transform(Checkpoints.cp)
        val keep = idxC.groupBy("shingle").agg(count("*").as("__df")).filter(col("__df") <= m)
        // using-column joins move the key to column 0 — re-select so the
        // downstream positional toDF stays (id, shingle)
        idxC.join(keep.select("shingle"), Seq("shingle")).select(idCol, "shingle")
      case None => idx0
    }
    // Explicitly-numbered repartition on the join key: the index is
    // small in BYTES but the self-join EXPANDS rows ~df^2-fold, and
    // AQE's byte-based coalescing would otherwise shrink this shuffle
    // to ~1 partition and run the whole expansion single-threaded.
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    // checkpointed: both self-join sides AND the sizes aggregate read
    // it (self-join aliases defeat exchange reuse)
    val keyed = idx.repartition(p, col("shingle")).transform(Checkpoints.cp)
    // sizes come from the SAME (possibly pruned) index as the
    // intersection counts, so the jaccard ratio is internally
    // consistent: with pruning it is exact jaccard over the pruned
    // shingle space, not a mixed-denominator underestimate
    val sizes = keyed.groupBy(idCol).agg(count("*").as("n"))
    // EXACT pruning of the join input: a shingle appearing in exactly
    // one doc cannot contribute to any intersection, and set sizes
    // were already taken above — dropping df==1 rows changes nothing
    // in the output but removes the (typically dominant) unique-shingle
    // mass from both self-join sides. The count window runs on data
    // already hash-partitioned by shingle, so it adds a sort, no shuffle.
    val shared = keyed
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("shingle")))
      .filter(col("__df") >= 2)
      .select(col(idCol), col("shingle"))
      // checkpointed: both self-join sides read it (aliases defeat reuse)
      .transform(Checkpoints.cp)
    val a = shared.toDF("ida", "shingle")
    val b = shared.toDF("idb", "shingle")
    val inter = a.join(b, Seq("shingle"))
      .filter(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count("*").as("i"))
    (inter, sizes)
  }

  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val (inter, sizes) = intersectionCounts(df, idCol, textCol, n, maxDocFreq)
    inter
      .join(sizes.toDF("ida", "na"), Seq("ida"))
      .join(sizes.toDF("idb", "nb"), Seq("idb"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("ida").as("a"), col("idb").as("b"), col("jaccard"))
  }

  /**
   * Exact ASYMMETRIC containment pairs: `C(a -> b) = |S(a) ∩ S(b)| /
   * |S(a)|` over distinct hashed n-gram shingles — the rule that
   * catches a short document embedded in a longer one (a prefix,
   * excerpt, or quotation), which symmetric Jaccard structurally
   * misses (a half-doc inside its source has J = 0.5 but C = 1.0).
   * Emits DIRECTED rows `(contained, container, containment)` for
   * every ordered pair meeting the threshold; both directions can
   * fire for true near-twins. Same scale shape as [[jaccardPairs]]:
   * inverted-index join, df==1 shingles pruned exactly, optional
   * stop-shingle cap — candidate volume scales with true overlap,
   * never all-pairs. */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val (inter, sizes) = intersectionCounts(df, idCol, textCol, n, maxDocFreq)
    val both = inter
      .join(sizes.toDF("ida", "na"), Seq("ida"))
      .join(sizes.toDF("idb", "nb"), Seq("idb"))
    val ab = both.select(col("ida").as("contained"), col("idb").as("container"),
      (col("i").cast("double") / col("na").cast("double")).as("containment"))
    val ba = both.select(col("idb").as("contained"), col("ida").as("container"),
      (col("i").cast("double") / col("nb").cast("double")).as("containment"))
    ab.unionByName(ba).filter(col("containment") >= threshold)
  }

  /**
   * MinHash + LSH banded near-dup pairs, exact-verified.
   *
   * signatures (bands*rowsPerBand hashes) -> per-band bucket key ->
   * explode -> self-join on (band, bucket) -> distinct candidate pairs
   * -> exact Jaccard on the shingle sets -> filter >= threshold.
   * Output: (a, b, jaccard), identical to [[jaccardPairs]] whenever
   * every >=threshold pair collides in >=1 band (for the default
   * 16 bands x 4 rows, a 0.9-Jaccard pair is missed with prob ~4e-8).
   */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    // Checkpointed: consumed by the banding stage AND twice by the
    // exact-verify joins — otherwise each consumer re-tokenizes and
    // re-hashes the whole corpus (self-join aliases defeat reuse).
    val withSets = df.select(col(idCol),
      graft.functions.ShingleHashes.shingle_hashes(df.sparkSession, col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .transform(Checkpoints.cp)
    // Band rows carry ONLY (id, band, bucket): the wide shingle arrays
    // stay out of the candidate-generating shuffle and are joined back
    // for the (few) surviving candidate pairs. Bucket keys come from
    // the one-pass native expression — the composed transform/slice
    // form re-evaluated the whole signature per band.
    val banded = withSets.select(
      col(idCol),
      posexplode(graft.functions.MinHashBuckets
        .minhash_buckets(df.sparkSession, col("sh"), bands, rowsPerBand)))
      .toDF(idCol, "band", "bucket")
      // pin the bucket-join shuffle width — see jaccardPairs
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("band"), col("bucket"))
      // checkpointed: both self-join sides read it, and the banding
      // pass (128 hashes per doc) is the dominant linear stage
      .transform(Checkpoints.cp)
    val cand = banded.toDF("ida", "band", "bucket")
      .join(banded.toDF("idb", "band", "bucket"), Seq("band", "bucket"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb")
      .dropDuplicates("ida", "idb")
    cand
      .join(withSets.toDF("ida", "sha"), Seq("ida"))
      .join(withSets.toDF("idb", "shb"), Seq("idb"))
      .withColumn("i", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard",
        col("i") / (size(col("sha")) + size(col("shb")) - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("ida").as("a"), col("idb").as("b"), col("jaccard"))
  }

  /**
   * Incremental (cross-corpus) near-dup detection: MinHash-LSH pairs
   * between an EXISTING corpus and a NEW batch — the daily-ingest
   * shape, where the new slice is deduped against everything already
   * accepted without ever re-pairing the old corpus with itself.
   * Same banding/verification as [[minHashLshPairs]]; candidates come
   * only from (corpus, new) bucket collisions. Ids must be disjoint.
   * Output: (corpus_id, new_id, jaccard).
   */
  def crossCorpusPairs(
      corpus: DataFrame,
      fresh: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    def withSets(df: DataFrame) = df.select(col(idCol),
      graft.functions.ShingleHashes.shingle_hashes(spark, col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .transform(Checkpoints.cp) // read by the banding stage AND the verify join
    def banded(sets: DataFrame) = sets.select(
      col(idCol),
      posexplode(graft.functions.MinHashBuckets
        .minhash_buckets(spark, col("sh"), bands, rowsPerBand)))
      .toDF(idCol, "band", "bucket")
    val cSets = withSets(corpus)
    val fSets = withSets(fresh)
    // pin the bucket-join shuffle width — see jaccardPairs (AQE's
    // byte-based coalescing vs the candidate expansion)
    val p = spark.sessionState.conf.numShufflePartitions
    val cand = banded(cSets).toDF("corpus_id", "band", "bucket")
      .repartition(p, col("band"), col("bucket"))
      .join(banded(fSets).toDF("new_id", "band", "bucket"), Seq("band", "bucket"))
      .select("corpus_id", "new_id")
      .dropDuplicates("corpus_id", "new_id")
    cand
      .join(cSets.toDF("corpus_id", "sha"), Seq("corpus_id"))
      .join(fSets.toDF("new_id", "shb"), Seq("new_id"))
      .withColumn("i", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard",
        col("i") / (size(col("sha")) + size(col("shb")) - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("corpus_id"), col("new_id"), col("jaccard"))
  }

  /** A persisted text-dedup index: the standing corpus's shingle-hash
    * sets and banded minhash buckets as parquet artifacts, plus the
    * parameters they were built with — the text-side sibling of the
    * IVFADC index discipline ([[Similarity.saveIndex]]): build once,
    * reopen per ingest batch, never recompute the standing corpus. */
  final case class TextIndex(sets: DataFrame, bandsDf: DataFrame,
      n: Int, bands: Int, rowsPerBand: Int)

  /** Write the index: `sets` (id, sh), `bands` (id, band, bucket),
    * `meta` (one row of build parameters). Append mode folds a new
    * batch INTO the standing index (same parameters enforced at
    * load). */
  def saveTextIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, path: String,
      append: Boolean = false): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val mode = if (append) "append" else "overwrite"
    if (append) {
      // Appending under different shingle/band parameters would silently
      // mix incompatible data beneath a meta claiming the new params —
      // enforce the contract the docstring promises, loudly. A missing
      // index is its own clear error (not a raw path-not-found).
      val existing =
        try spark.read.parquet(s"$path/meta").collect()
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getMessage != null && e.getMessage.contains("PATH_NOT_FOUND") =>
            throw new IllegalArgumentException(
              s"no text index at $path — build one with append=false first", e)
        }
      require(existing.length == 1, s"bad text-index meta at $path")
      val (en, eb, er) = (existing(0).getAs[Int]("n"),
        existing(0).getAs[Int]("bands"), existing(0).getAs[Int]("rows_per_band"))
      require(en == n && eb == bands && er == rowsPerBand,
        s"text-index parameter mismatch at $path: stored (n=$en, bands=$eb, " +
          s"rowsPerBand=$er) vs append (n=$n, bands=$bands, rowsPerBand=$rowsPerBand)")
    }
    val sets = df.select(col(idCol).as("id"),
      graft.functions.ShingleHashes.shingle_hashes(spark, col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .transform(Checkpoints.cp)
    sets.write.mode(mode).parquet(s"$path/sets")
    sets.select(col("id"),
      posexplode(graft.functions.MinHashBuckets
        .minhash_buckets(spark, col("sh"), bands, rowsPerBand)))
      .toDF("id", "band", "bucket")
      .write.mode(mode).parquet(s"$path/bands")
    Seq((n, bands, rowsPerBand)).toDF("n", "bands", "rows_per_band")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Reopen a persisted index; the stored parameters ARE the index's
    * contract (a query batch must shingle/band identically). */
  def loadTextIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): TextIndex = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1, s"bad text-index meta at $path")
    TextIndex(
      spark.read.parquet(s"$path/sets"),
      spark.read.parquet(s"$path/bands"),
      meta(0).getAs[Int]("n"), meta(0).getAs[Int]("bands"),
      meta(0).getAs[Int]("rows_per_band"))
  }

  /** New-batch near-dup pairs against a REOPENED index — the
    * [[crossCorpusPairs]] semantics with the corpus side read from
    * parquet instead of recomputed: banded candidates on (band,
    * bucket), exact-jaccard verification against the stored shingle
    * sets. Returns (corpus_id, new_id, jaccard). */
  def incrementalPairsAgainst(index: TextIndex, fresh: DataFrame,
      idCol: String, textCol: String, threshold: Double): DataFrame = {
    val spark = fresh.sparkSession
    val fSets = fresh.select(col(idCol),
      graft.functions.ShingleHashes.shingle_hashes(spark, col(textCol), index.n).as("sh"))
      .filter(size(col("sh")) > 0)
      .transform(Checkpoints.cp)
    val fBands = fSets.select(col(idCol),
      posexplode(graft.functions.MinHashBuckets
        .minhash_buckets(spark, col("sh"), index.bands, index.rowsPerBand)))
      .toDF("new_id", "band", "bucket")
    val p = spark.sessionState.conf.numShufflePartitions
    val cand = index.bandsDf.toDF("corpus_id", "band", "bucket")
      .repartition(p, col("band"), col("bucket"))
      .join(fBands, Seq("band", "bucket"))
      .select("corpus_id", "new_id")
      .dropDuplicates("corpus_id", "new_id")
    cand
      .join(index.sets.toDF("corpus_id", "sha"), Seq("corpus_id"))
      .join(fSets.toDF("new_id", "shb"), Seq("new_id"))
      .withColumn("i", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard",
        col("i") / (size(col("sha")) + size(col("shb")) - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("corpus_id"), col("new_id"), col("jaccard"))
  }

  /** A persisted 64-bit-fingerprint dedup index — the perceptual-hash
    * sibling of [[TextIndex]] (q231): the standing corpus's
    * fingerprints plus their pigeonhole band keys as parquet
    * artifacts, so IMAGE ingest can dedup incrementally exactly like
    * text ([[incrementalPairsAgainst]]) — build once, reopen per
    * batch, never rehash the standing corpus. `maxHamming` is the
    * index's contract (it fixes the chunk count); a batch must band
    * identically. */
  final case class HashIndex(fps: DataFrame, bandsDf: DataFrame,
      maxHamming: Int)

  /** The (chunk, key) band rows of [[hammingPairs64]]'s pigeonhole
    * scheme for one fingerprint table — shared by the in-query join,
    * the index writer and the incremental prober so all three bucket
    * BIT-IDENTICALLY. */
  private def bandKeys64(fp: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1 // hamming<=k => some chunk of k+1 equal chunks matches
    val width = 64 / chunks
    // normalize the fingerprint column name in its OWN projection —
    // aliasing and chunk-exploding it in one select makes Spark 4
    // resolve the chunk expression as a lateral column alias (internal
    // analyzer error under Generate)
    fp.select(col(idCol).as("id"), col(fpCol).as("fp"))
      .select(col("id"), col("fp"),
        posexplode(transform(
          sequence(lit(0), lit(chunks - 1)),
          c => call_function("shiftrightunsigned", col("fp"), c * lit(width))
            .bitwiseAND(lit((1L << width) - 1)))))
      .toDF("id", "fp", "chunk", "key")
  }

  /** Write a fingerprint index: `fps` (id, fp), `bands` (id, chunk,
    * key), `meta` (max_hamming). Append mode folds a new batch INTO
    * the standing index (same maxHamming enforced at append — a
    * different value would band incompatibly under a meta claiming
    * otherwise). Null fingerprints (decode failures) are excluded,
    * like every hashing path here.
    *
    * Crash discipline (the two data artifacts cannot be written in one
    * transaction on a plain filesystem, so the ORDER carries the
    * guarantee — HashIndexAtomicitySpec pins both arms):
    *  - APPEND writes bands BEFORE fps: every probe path
    *    ([[incrementalHammingAgainst]]) inner-joins band candidates to
    *    their stored fingerprints, so a crash between the two writes
    *    leaves the new batch's band rows DANGLING (no fingerprint to
    *    verify against) and probes see exactly the old index — fully
    *    old, never a skewed mix. (fps-first would instead leave
    *    fingerprints no band row can reach: also old-looking, but a
    *    later identical append would duplicate them.) The meta file is
    *    NOT rewritten on append — its content is unchanged by
    *    construction (the maxHamming equality require above), so the
    *    append path has no meta failure window at all.
    *  - OVERWRITE of a standing index first INVALIDATES meta (a
    *    zero-row marker), then rewrites fps and bands, then writes the
    *    real meta LAST — a crash anywhere between leaves an index
    *    [[loadHashIndex]] rejects loudly ("bad hash-index meta")
    *    instead of silently mixing old fps with new bands. */
  def saveHashIndex(fp: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int, path: String, append: Boolean = false): Unit = {
    require(maxHamming >= 1 && maxHamming <= 15,
      "chunked banding needs 1 <= maxHamming <= 15")
    val spark = fp.sparkSession
    import spark.implicits._
    if (append) {
      val existing =
        try spark.read.parquet(s"$path/meta").collect()
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getMessage != null && e.getMessage.contains("PATH_NOT_FOUND") =>
            throw new IllegalArgumentException(
              s"no hash index at $path — build one with append=false first", e)
        }
      require(existing.length == 1, s"bad hash-index meta at $path")
      val eh = existing(0).getAs[Int]("max_hamming")
      require(eh == maxHamming,
        s"hash-index parameter mismatch at $path: stored maxHamming=$eh " +
          s"vs append maxHamming=$maxHamming")
    }
    val clean = fp.select(col(idCol).as("id"), col(fpCol).as("fp"))
      .filter(col("fp").isNotNull)
      .transform(Checkpoints.cp) // read by both artifact writes
    if (append) {
      writeHashIndexBands(clean, maxHamming, path, "append")
      writeHashIndexFps(clean, path, "append")
    } else {
      spark.emptyDataset[Int].toDF("max_hamming")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
      writeHashIndexFps(clean, path, "overwrite")
      writeHashIndexBands(clean, maxHamming, path, "overwrite")
      Seq(maxHamming).toDF("max_hamming")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    }
  }

  /** The fps half of [[saveHashIndex]] — private[graft] so the
    * atomicity spec can reproduce a crash BETWEEN the two data
    * writes. */
  private[graft] def writeHashIndexFps(clean: DataFrame, path: String,
      mode: String): Unit =
    clean.write.mode(mode).parquet(s"$path/fps")

  /** The bands half of [[saveHashIndex]] — see [[writeHashIndexFps]]. */
  private[graft] def writeHashIndexBands(clean: DataFrame, maxHamming: Int,
      path: String, mode: String): Unit =
    bandKeys64(clean, "id", "fp", maxHamming)
      .select("id", "chunk", "key")
      .write.mode(mode).parquet(s"$path/bands")

  /** Reopen a persisted fingerprint index. */
  def loadHashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): HashIndex = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1, s"bad hash-index meta at $path")
    HashIndex(
      spark.read.parquet(s"$path/fps"),
      spark.read.parquet(s"$path/bands"),
      meta(0).getAs[Int]("max_hamming"))
  }

  /** New-batch near-dup pairs against a REOPENED fingerprint index —
    * [[hammingPairs64]]'s pigeonhole semantics with the corpus side
    * read from parquet instead of rehashed: banded candidates on
    * (chunk, key), popcount-verified against the stored fingerprints.
    * Returns (corpus_id, new_id, hamming), hamming <= the index's
    * maxHamming. Never all-pairs: candidate volume is bounded by
    * per-chunk-value bucket sizes on BOTH sides. */
  def incrementalHammingAgainst(index: HashIndex, fresh: DataFrame,
      idCol: String, fpCol: String): DataFrame = {
    val spark = fresh.sparkSession
    val fFp = fresh.select(col(idCol).as("id"), col(fpCol).as("fp"))
      .filter(col("fp").isNotNull)
      .transform(Checkpoints.cp) // read by the banding AND the verify join
    val fBands = bandKeys64(fFp, "id", "fp", index.maxHamming)
      .select(col("id").as("new_id"), col("chunk"), col("key"))
    val p = spark.sessionState.conf.numShufflePartitions
    val cand = index.bandsDf.toDF("corpus_id", "chunk", "key")
      .repartition(p, col("chunk"), col("key"))
      .join(fBands, Seq("chunk", "key"))
      .select("corpus_id", "new_id")
      .dropDuplicates("corpus_id", "new_id")
    cand
      .join(index.fps.toDF("corpus_id", "fpa"), Seq("corpus_id"))
      .join(fFp.toDF("new_id", "fpb"), Seq("new_id"))
      .withColumn("hamming", bit_count(col("fpa").bitwiseXOR(col("fpb"))))
      .filter(col("hamming") <= index.maxHamming)
      .select(col("corpus_id"), col("new_id"), col("hamming"))
  }

  /**
   * SimHash near-dup pairs: 64-bit fingerprint per doc
   * ([[graft.functions.SimHash64]]), candidates via the pigeonhole
   * principle — hamming distance <= 3 over 64 bits implies at least one
   * of 4 16-bit chunks is identical — then popcount-verified.
   * Output: (a, b, hamming), a < b, hamming <= maxHamming (<= 15).
   */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxHamming: Int): DataFrame = {
    graft.functions.SimHash64.register(df.sparkSession)
    hammingPairs64(df.select(col(idCol),
      graft.functions.SimHash64.simhash64(
        graft.functions.ShingleHashes.shingle_hashes(df.sparkSession, col(textCol), n))
        .as("fp")), idCol, "fp", maxHamming)
  }

  /** The banded near-dup join over ANY 64-bit fingerprint column —
    * [[simHashPairs]]'s machinery factored out so other perceptual
    * hashes ride it (q223's image dHash): candidates via the
    * pigeonhole principle (hamming <= k over 64 bits implies one of
    * k+1 equal-width chunks matches), popcount-verified. NEVER
    * all-pairs: candidate volume is bounded by per-chunk-value bucket
    * sizes, the same scale shape as MinHash banding.
    * Output: (a, b, hamming), a < b, hamming <= maxHamming (<= 15). */
  def hammingPairs64(
      fp: DataFrame,
      idCol: String,
      fpCol: String,
      maxHamming: Int): DataFrame = {
    val df = fp
    // lower bound matters too: maxHamming = 0 would make chunks = 1 /
    // width = 64, and (1L << 64) wraps to 1 in Scala (shift mod 64),
    // collapsing every fingerprint to one bucket — a full all-pairs
    // join. Exact equality wants a plain groupBy on fp, not banding.
    require(maxHamming >= 1 && maxHamming <= 15,
      "chunked banding needs 1 <= maxHamming <= 15 (use an exact " +
        "groupBy on the fingerprint for hamming = 0)")
    // band keys via the shared bandKeys64 (the index writer and the
    // incremental prober bucket bit-identically by construction)
    val banded = bandKeys64(fp, idCol, fpCol, maxHamming)
      // pin the chunk-join shuffle width — see jaccardPairs
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("chunk"), col("key"))
      // checkpointed: both self-join sides read it (aliases defeat reuse)
      .transform(Checkpoints.cp)
    val l = banded.toDF("ida", "fpa", "chunk", "key")
    val r = banded.toDF("idb", "fpb", "chunk", "key")
    l.join(r, Seq("chunk", "key"))
      .filter(col("ida") < col("idb"))
      .select("ida", "fpa", "idb", "fpb")
      .dropDuplicates("ida", "idb")
      .withColumn("hamming", bit_count(col("fpa").bitwiseXOR(col("fpb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("ida").as("a"), col("idb").as("b"), col("hamming"))
  }
}
