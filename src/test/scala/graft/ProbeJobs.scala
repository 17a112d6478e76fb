package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-19 optimization probe (guide §1/§7): per-query job/stage/task
  * counts and summed task time via a SparkListener, to separate
  * scheduling overhead from real compute on this host — plus tokenize
  * expression variants for the decode family.
  *
  * `Test/runMain graft.ProbeJobs [q1,q2,...]`
  */
object ProbeJobs {
  val jobs = new AtomicInteger(0)
  val stages = new AtomicInteger(0)
  val tasks = new AtomicInteger(0)
  val taskNanos = new AtomicLong(0L)

  class L extends SparkListener {
    override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks)
      ()
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      if (t.taskInfo != null) taskNanos.addAndGet(t.taskInfo.duration * 1000000L)
      ()
    }
  }

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
    spark.sparkContext.addSparkListener(new L)

    // warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    for (t <- Seq("documents", "embeddings", "lineitem", "orders", "events"))
      spark.read.parquet(s"$sfDir/$t.parquet").foreach(_ => ())

    val names: Seq[String] =
      if (args.nonEmpty) args(0).split(',').toSeq
      else Seq(
        "q160_pagerank_dangling", "q158_ann_filtered", "q112_ann_ivfpq_batch",
        "q200_ingest_v4", "q228_bitext_margin_ann", "q179_ingest_v3",
        "q137_video_frames", "q300_serving_autoconf", "q100_ingest_pipeline",
        "q129_containment", "q95_semantic_dedup", "q231_image_index_incremental",
        "q154_ingest_v2", "q52_training_pipeline", "q294_ann_auto_nprobe",
        "q264_torch_beam_fused", "q271_torch_beam_fused_watermark",
        "q290_torch_auto_branch", "q283_torch_auto_gamma",
        "q199_torch_spec_decode", "q212_torch_cross_spec",
        "q254_torch_spec_loop", "q120_cdc_chunks", "q61_dedup_clusters",
        "q21_jaccard_pairs", "q33_embed_neardup", "q05_agg_pricing",
        "q06_join_agg_revenue", "q17_tokenize_stats", "q75_retrieval_prep")

    println(f"${"query"}%-36s ${"wall_s"}%8s ${"jobs"}%5s ${"stg"}%4s ${"tasks"}%6s ${"taskSum_s"}%9s")
    for (n <- names if SparkEntry.queries.contains(n)) {
      // one untimed warm pass so codegen/broadcast costs do not pollute
      try {
        SparkEntry.queries(n)(spark, sfDir).count()
        jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0L)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener is async; give it a beat to drain
        Thread.sleep(150)
        println(f"$n%-36s $wall%8.3f ${jobs.get}%5d ${stages.get}%4d ${tasks.get}%6d ${taskNanos.get / 1e9}%9.3f")
      } catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}") }
    }

    // ---- tokenize variants (decode-family input stage) ----
    val m = SparkEntry.genModel
    val vocab = m.seqHead.get.vocab
    def time(label: String)(f: => Unit): Unit = {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label%-40s min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("tok_shipped_transform_then_slice") {
      docs.select(col("doc_id"),
        slice(transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab),
          1, 12).as("tok_ids"))
        .filter(size(col("tok_ids")) >= 1)
        .write.format("noop").mode("overwrite").save()
    }
    time("tok_slice_then_transform") {
      docs.select(col("doc_id"),
        transform(
          slice(call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)), 1, 12),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab).as("tok_ids"))
        .filter(size(col("tok_ids")) >= 1)
        .write.format("noop").mode("overwrite").save()
    }
    time("tok_regex_only") {
      docs.select(col("doc_id"),
        slice(call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)), 1, 12).as("tok_ids"))
        .filter(size(col("tok_ids")) >= 1)
        .write.format("noop").mode("overwrite").save()
    }
    time("tok_slice_transform_repart") {
      docs.repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          transform(
            slice(call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)), 1, 12),
            tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab).as("tok_ids"))
        .filter(size(col("tok_ids")) >= 1)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
