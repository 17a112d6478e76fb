package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 optimization probe (guide §1: measure first).
  *
  * Breaks a representative torch decode query (q264_torch_beam_fused)
  * into its cost components so the optimization targets the real
  * bottleneck, not a guess:
  *   - fixed per-job overhead (empty-ish count)
  *   - tokenize-only (noop sink so nothing is pruned)
  *   - full query as shipped
  *   - full query with the tokenized input hash-repartitioned to
  *     defaultParallelism before the decode mapPartitions
  *   - decode-only on a cached tokenized input (isolates the kernel)
  */
object ProbeR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label%-40s min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q264_torch_beam_fused")(spark, sfDir).count()

    time("job_overhead_range_count") {
      spark.range(32 * 1000).repartition(32).count(): Unit
    }

    val m = SparkEntry.genModel
    val vocab = m.seqHead.get.vocab
    val toks = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"),
      slice(transform(
        call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
        tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab),
        1, 12).as("tok_ids"))
      .filter(size(col("tok_ids")) >= 1)

    time("tokenize_only_noop") {
      toks.write.format("noop").mode("overwrite").save()
    }
    time("tokenize_repart_noop") {
      spark.read.parquet(s"$sfDir/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          slice(transform(
            call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
            tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab),
            1, 12).as("tok_ids"))
        .filter(size(col("tok_ids")) >= 1)
        .write.format("noop").mode("overwrite").save()
    }

    time("q264_as_shipped_count") {
      SparkEntry.queries("q264_torch_beam_fused")(spark, sfDir).count(): Unit
    }
    time("q264_as_shipped_noop") {
      SparkEntry.queries("q264_torch_beam_fused")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    // decode with a pre-decode repartition of the TOKENIZED frame
    // (exchange above the tokenize project: tokenize still 1 task)
    val bc = spark.sparkContext.broadcast(m)
    time("decode_repart_after_tokenize") {
      graft.torch.Torch.beamSearch(
          toks.repartition(spark.sparkContext.defaultParallelism, col("doc_id")),
          "tok_ids", "beams", bc, steps = 2, width = 2, batchSize = 256)
        .select(col("doc_id"), col("beams")(0)(0).as("b1t1"))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    // repartition BELOW the tokenize project: both parallelize
    val toksPar = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        slice(transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab),
          1, 12).as("tok_ids"))
      .filter(size(col("tok_ids")) >= 1)
    time("decode_repart_before_tokenize") {
      graft.torch.Torch.beamSearch(toksPar,
          "tok_ids", "beams", bc, steps = 2, width = 2, batchSize = 256)
        .select(col("doc_id"), col("beams")(0)(0).as("b1t1"))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    time("decode_no_repart") {
      graft.torch.Torch.beamSearch(toks,
          "tok_ids", "beams", bc, steps = 2, width = 2, batchSize = 256)
        .select(col("doc_id"), col("beams")(0)(0).as("b1t1"))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }

    // ---- ANN build breakdown (q112/q158 shape) ----
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    time("ann_ivfpq_train_16") {
      graft.operators.Similarity.ivfPqTrain(emb, "embedding",
        dim = 64, nlist = 16, m = 8, ksub = 32): Unit
    }
    time("ann_ivfpq_train_64") {
      graft.operators.Similarity.ivfPqTrain(emb, "embedding",
        dim = 64, nlist = 64, m = 8, ksub = 32): Unit
    }
    val ix16 = graft.operators.Similarity.ivfPqTrain(emb, "embedding",
      dim = 64, nlist = 16, m = 8, ksub = 32)
    time("ann_ivfpq_encode") {
      graft.operators.Similarity.ivfPqEncode(emb, "vec_id", "embedding", ix16)
        .write.format("noop").mode("overwrite").save()
    }
    time("q112_as_shipped") {
      SparkEntry.queries("q112_ann_ivfpq_batch")(spark, sfDir).count(): Unit
    }
    spark.stop()
  }
}
