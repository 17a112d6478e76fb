package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bm25Ref(tf: Int, df: Int, n: Int, dl: Int, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
      (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

  test("bm25TopK matches the hand-computed Okapi formula; idf ranks rare over common") {
    // 4 docs, 4 words each (avgdl exact); "rare" appears once in the
    // corpus, "the" in every doc — one rare hit must outscore many
    // common hits at equal length
    val docs = Seq(
      (1L, "the the the the"),
      (2L, "the rare cat cat"),
      (3L, "the cat cat cat"),
      (4L, "dog dog dog dog")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("the", "rare"), k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val n = 4; val avgdl = 4.0
    val exp = Map( // (doc -> score) from the formula directly
      1L -> bm25Ref(4, 3, n, 4, avgdl),
      2L -> (bm25Ref(1, 3, n, 4, avgdl) + bm25Ref(1, 1, n, 4, avgdl)),
      3L -> bm25Ref(1, 3, n, 4, avgdl))
    assert(got.length == 3) // doc 4 has no query term
    for ((id, _, score) <- got)
      assert(math.abs(score - exp(id)) < 1e-12, s"doc $id: $score vs ${exp(id)}")
    // the single rare hit beats four common hits; ranks are dense 1..3
    val byRank = got.sortBy(_._2).map(_._1).toSeq
    assert(byRank.head == 2L, s"rare-term doc should rank first: $byRank")
    assert(got.map(_._2).sorted.toSeq == Seq(1, 2, 3))
  }

  test("bm25TopK ties break by id; k truncates after ordering") {
    val docs = Seq(
      (5L, "x y"), (3L, "x y"), (9L, "x y"), (7L, "z z")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq.sortBy(_._2) == Seq((3L, 1), (5L, 2))) // 9 cut by k
  }

  test("rrfFuse: both-lists membership sums contributions, single-list carries null rank") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "ra")
    val b = Seq((2L, 1), (4L, 2)).toDF("id", "rb")
    val got = Retrieval.rrfFuse(a, "ra", b, "rb", "id", k = 10, kRrf = 60)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        r.getDouble(3)))
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(2L)._4 == 1.0 / 62 + 1.0 / 61) // in both lists
    assert(byId(1L) == ((1L, 1, -1, 1.0 / 61)))
    assert(byId(4L) == ((4L, -1, 2, 1.0 / 62)))
    // fused order: doc 2 (two contributions) first, then by rrf desc, id asc
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 4L, 3L))
  }

  test("bm25 plan shape: stats broadcast, top-k as TakeOrderedAndProject") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark", "dup"), k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("maxSimTopK: per-token coverage beats single-term repetition; table sane") {
    import spark.implicits._
    // the defining late-interaction property: a doc containing EVERY
    // query term once outscores a doc repeating ONE term many times —
    // a pooled single vector cannot express this
    val emb = graft.SparkEntry.maxSimEmb
    val qids = graft.SparkEntry.maxSimQueryIds
    assert(qids.distinct.size == qids.size)
    assert(emb.forall(r => r.exists(_ != 0f)),
      "a zero embedding row would make cosine NaN")
    val other = (0 until 32).filterNot(qids.contains).head
    val docs = Seq(
      (1L, qids),                       // covers all three terms
      (2L, Seq.fill(12)(qids.head)),    // repeats one term
      (3L, Seq.fill(8)(other))          // matches nothing well
    ).toDF("doc_id", "tok_ids")
    val out = Retrieval.maxSimTopK(docs, "doc_id", "tok_ids", emb, qids, k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(2L),
      s"coverage ${out(1L)} must beat repetition ${out(2L)}")
    // exact self-match: each term's max cosine vs itself is 1.0, so
    // the full-coverage doc scores the term count exactly
    assert(math.abs(out(1L) - qids.size.toDouble) < 1e-6, s"got ${out(1L)}")
  }

  test("maxSimTopKAnn: shortlist genuinely prunes, yet the top-k equals the full scan") {
    import org.apache.spark.sql.functions._
    val emb = graft.SparkEntry.maxSimEmb
    val qids = graft.SparkEntry.maxSimQueryIds
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        transform(
          call_function("regexp_extract_all", col("text"),
            lit(graft.Tok.Pattern), lit(0)),
          tk => (conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % 32)
            .cast("int")).as("tok_ids"))
    val full = Retrieval.maxSimTopK(docs, "doc_id", "tok_ids", emb, qids, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ann = Retrieval.maxSimTopKAnn(docs, "doc_id", "tok_ids", emb, qids,
        k = 10, r = 8, nlist = 8, m = 2, ksub = 16, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ann == full, s"shortlisted top-10 diverged:\n$ann\nvs\n$full")
    // the stage-1 filter genuinely prunes where pruning is possible:
    // SHORT docs (the real ColBERT passage shape — a long random doc
    // over a 32-token vocab contains some near token almost surely).
    // Build single-token docs, one per vocab id: exactly the docs
    // whose token was retrieved for some query term survive.
    val singles = (0 until 32).map(t => (t.toLong, Seq(t)))
      .toDF("doc_id", "tok_ids")
    val kept = Retrieval.maxSimTopKAnn(singles, "doc_id", "tok_ids", emb,
        qids, k = 32, r = 4, nlist = 8, m = 2, ksub = 16, nprobe = 6)
      .count()
    assert(kept < 32, s"shortlist kept all 32 single-token docs - vacuous")
    assert(kept >= qids.size, "the query terms' own tokens must survive")
    info(s"shortlist kept $kept of 32 single-token docs")
  }
}
