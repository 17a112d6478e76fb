package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q246's retrieval leg A/B (round-17, VERDICT r16 item 1): the
  * IVFADC shortlist + exact-cosine rerank must pick the SAME top-1
  * neighbor as the brute comparator for every query — the capstone's
  * oracle is exact brute SQL, so anything short of 100% agreement
  * here is a latent correctness break, not a recall tradeoff. The
  * pick is the hardened (cos6 DESC, vec_id) rule on both sides, so
  * agreement is decision-level, never last-ulp luck. */
class RagRetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("IVFADC shortlist + cos6 rerank top-1 == brute top-1 for every query") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val qs = emb.filter(col("vec_id") < 20)
    val q = qs.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val w = Window.partitionBy("q_id").orderBy(col("cos6").desc, col("vec_id"))

    def top1(cands: org.apache.spark.sql.DataFrame): Map[Long, Long] = cands
      .filter(col("vec_id") =!= col("q_id"))
      .join(emb, "vec_id")
      .join(broadcast(q), "q_id")
      .withColumn("cos6", round(graft.functions.CosineSim.cosine_sim(spark,
        col("qe").cast("array<double>"),
        col("embedding").cast("array<double>")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("q_id", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute: every (query, corpus) pair is a candidate
    val brute = top1(q.select("q_id").crossJoin(emb.select("vec_id")))
    // the q246 leg: the ADC top-100, all 16 fixture cells probed
    val ix = Similarity.ivfPqTrain(emb, "embedding",
      dim = 64, nlist = 16, m = 8, ksub = 32)
    val codes = Similarity.ivfPqEncode(emb, "vec_id", "embedding", ix)
    val ann = top1(Similarity.ivfPqTopK(codes, qs, "vec_id", "embedding", ix,
      k = 100, nprobe = 16).select("q_id", "vec_id"))

    assert(brute.size == 20 && ann.size == 20,
      s"expected 20 picks per side: brute=${brute.size} ann=${ann.size}")
    val disagree = brute.keys.filter(k => !ann.get(k).contains(brute(k)))
    assert(disagree.isEmpty,
      s"ANN pick diverged from brute for queries $disagree " +
        s"(brute=${disagree.map(brute)}, ann=${disagree.map(ann.get)})")
  }
}
