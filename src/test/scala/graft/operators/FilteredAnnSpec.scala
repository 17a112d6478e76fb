package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Filtered ANN contract (q158): the predicate runs BELOW the
 * shortlist, so (a) every returned neighbor satisfies it, (b) every
 * query gets its full k whenever the filtered subset can supply it,
 * and (c) recall against brute force ON THE FILTERED SUBSET beats the
 * post-filter recipe — which this spec shows actually degrading on
 * the same data (the failure mode the operator exists to fix).
 */
class FilteredAnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding", "label")
  private def pred = col("label") % 3 === 0

  private lazy val ix = Similarity.ivfPqTrain(emb, "embedding",
    dim = 64, nlist = 64, m = 8, ksub = 32)
  private lazy val codesMeta = Similarity
    .ivfPqEncode(emb, "vec_id", "embedding", ix)
    .join(emb.select(col("vec_id"), col("label")), "vec_id")
  private lazy val queries = emb.filter(col("vec_id") < 20).select("vec_id", "embedding")

  test("filtered search: all neighbors satisfy the predicate; full k per query") {
    val out = Similarity.ivfPqTopKFilteredReranked(emb, codesMeta, queries,
        "vec_id", "embedding", ix, k = 5, shortlist = 50, nprobe = 16, pred = pred)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Int]("label")))
    assert(out.nonEmpty)
    assert(out.forall(_._3 % 3 == 0), "a returned neighbor violates the predicate")
    val perQ = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perQ.size == 20 && perQ.values.forall(_ == 5),
      s"not every query got its full k: $perQ")
  }

  test("post-filtering an unfiltered search degrades k and recall; the pushed filter does not") {
    val post = Similarity.ivfPqTopKReranked(emb, codesMeta.select("vec_id", "cell", "codes"),
        queries, "vec_id", "embedding", ix, k = 5, shortlist = 50, nprobe = 16)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .filter(pred)
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("vec_id"))
    val postPerQ = post.groupBy(_._1).view.mapValues(_.length).toMap
    // the silent degradation: with ~1/3 of rows surviving the filter,
    // a top-5 post-filtered leaves most queries short of k
    assert(postPerQ.size < 20 || postPerQ.values.exists(_ < 5),
      s"post-filter unexpectedly kept full k everywhere: $postPerQ")
    val brute = Similarity.bruteForceTopK(emb.filter(pred).select("vec_id", "embedding"),
        queries, "vec_id", "embedding", k = 5)
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("vec_id")).toSet
    val filtered = Similarity.ivfPqTopKFilteredReranked(emb, codesMeta, queries,
        "vec_id", "embedding", ix, k = 5, shortlist = 50, nprobe = 16, pred = pred)
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("vec_id")).toSet
    val recFiltered = (brute & filtered).size.toDouble / brute.size
    val recPost = (brute & post.toSet).size.toDouble / brute.size
    assert(recFiltered > recPost,
      s"pushed filter ($recFiltered) does not beat post-filter ($recPost)")
    assert(recFiltered >= 0.5, s"filtered-subset recall floor violated: $recFiltered")
  }
}
