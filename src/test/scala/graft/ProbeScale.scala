package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-20 scaling witness (VERDICT r19 item 10): at sf0.1 the fixture
  * is job-scheduling-bound (~1.4 s for a trivial 32-task job), so
  * 8-vs-32-core bench totals sit near 1.0 and parallel-speedup claims
  * rested on plan shapes alone. This probe builds a ~10x input (sf1
  * scale) by unioning id-shifted copies of the fixture and times two
  * real operator shapes — the minhash/shingle dedup pair pipeline
  * (q21/q22's kernel) and the IVFADC encode+batch-search chain
  * (q112's kernel) — at the session's core count. Run it twice:
  *
  *   SPARK_GRAFT_CPUS=32 Test/runMain graft.ProbeScale
  *   SPARK_GRAFT_CPUS=8  Test/runMain graft.ProbeScale
  *
  * and compare the printed seconds: compute-dense stages should scale
  * near-linearly once the input dwarfs the job floor.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def amplify(df: DataFrame, idCol: String, shift: Long): DataFrame =
      (0 until copies).map { i =>
        df.withColumn(idCol, col(idCol) + lit(i * shift))
      }.reduce(_ unionByName _)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $label%-28s cpus=$cpus%3s copies=$copies ${(System.nanoTime() - t0) / 1e9}%8.3f s (n=$n)")
    }

    val docs = amplify(
      spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text"),
      "doc_id", 10000000L)
    val emb = amplify(
      spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding"),
      "vec_id", 10000000L)
    // warm: touch inputs so page-cache state is uniform
    docs.foreach(_ => ())
    emb.foreach(_ => ())

    time("jaccard_pairs(shingle+join)") {
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8).count()
    }
    time("ivfpq_encode+batch_search") {
      val ix = graft.operators.Similarity.ivfPqTrain(emb, "embedding",
        dim = 64, nlist = 16, m = 8, ksub = 32)
      val codes = graft.operators.Similarity.ivfPqEncode(emb, "vec_id", "embedding", ix)
      val qs = emb.filter(col("vec_id") % 70 === 0)
      graft.operators.Similarity.ivfPqTopKBatchReranked(emb, codes, qs,
        "vec_id", "embedding", ix, k = 5, shortlist = 100, nprobe = 14).count()
    }
    spark.stop()
  }
}
