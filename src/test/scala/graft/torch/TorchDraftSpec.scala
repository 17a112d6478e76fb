package graft.torch

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-18 draft-acceleration pins: prompt-lookup decoding (q262) and
 * tree-draft speculative decoding (q263). Both use GREEDY-equivalence
 * verification, so the load-bearing invariant is identical for each:
 * the emitted tokens are EXACTLY a prefix (length n_accepted + 1) of
 * the plain generateGreedy rollout — the draft machinery decides how
 * many greedy tokens one verification pass yields, never WHICH tokens
 * come out. The greedy rollout itself carries the argmax gap floors
 * the existing TorchGenerateSpec pins, so these specs add only the
 * draft-side decisions: the integer n-gram lookup (q262) and the
 * p6-rank tree construction with its rank-boundary gap floor (q263).
 */
class TorchDraftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixturePrompts(vocab: Int) = {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        slice(transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab),
          1, 12).as("tok_ids"))
      .filter(size(col("tok_ids")) >= 1)
  }

  /** The pure-Scala reference lookup: earliest earlier occurrence of
    * the final ngram, continuation clipped to maxDraft. */
  private def refLookup(p: Array[Int], ngram: Int,
      maxDraft: Int): Array[Int] = {
    val L = p.length
    if (L <= ngram) return Array.emptyIntArray
    val patStart = L - ngram
    val i = (0 until patStart).find(i =>
      (0 until ngram).forall(k => p(i + k) == p(patStart + k)))
    i match {
      case None => Array.emptyIntArray
      case Some(s) => p.slice(s + ngram, math.min(s + ngram + maxDraft, L))
    }
  }

  test("q262 prompt-lookup: emitted == greedy prefix; drafts == reference lookup; mixed outcomes") {
    val m = graft.SparkEntry.genModel
    val vocab = m.seqHead.get.vocab
    val bc = spark.sparkContext.broadcast(m)
    val toks = fixturePrompts(vocab)
    val pl = Torch.generatePromptLookup(toks, "tok_ids", bc, ngram = 2,
        maxDraft = 2)
      .select("doc_id", "tok_ids", "draft_toks", "n_drafted", "n_accepted",
        "out_toks")
      .collect()
      .map(r => r.getLong(0) -> (
        r.getSeq[Int](1).toArray, r.getSeq[Int](2).toArray,
        r.getInt(3), r.getInt(4), r.getSeq[Int](5).toArray))
      .toMap
    val greedy = Torch.generateGreedy(toks, "tok_ids", "gen", bc, steps = 3)
      .select("doc_id", "gen").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    assert(pl.nonEmpty && pl.keySet == greedy.keySet)
    var withDrafts = 0
    var accepted = 0
    for ((id, (prompt, drafts, nDrf, nAcc, out)) <- pl) {
      val ref = refLookup(prompt, 2, 2)
      assert(drafts.toSeq == ref.toSeq,
        s"doc $id: drafts ${drafts.toSeq} != reference ${ref.toSeq}")
      assert(nDrf == drafts.length)
      assert(out.length == nAcc + 1,
        s"doc $id: ${out.length} emitted for n_acc=$nAcc")
      assert(out.toSeq == greedy(id).take(nAcc + 1).toSeq,
        s"doc $id: emitted ${out.toSeq} not the greedy prefix " +
          s"${greedy(id).toSeq}")
      // acceptance really is prefix-equality against the rollout
      assert(nAcc == drafts.toSeq.zip(greedy(id)).takeWhile {
        case (d, g) => d == g
      }.length)
      if (nDrf > 0) withDrafts += 1
      if (nAcc > 0) accepted += 1
    }
    info(s"q262 sf0.001: ${pl.size} docs, $withDrafts with drafts, " +
      s"$accepted with acceptances")
    assert(withDrafts > 0, "fixture never matched an n-gram — vacuous gate")
  }

  test("q262: a prompt shorter than ngram+1 drafts nothing and emits one greedy token") {
    val m = graft.SparkEntry.genModel
    val bc = spark.sparkContext.broadcast(m)
    val df = Seq((1L, Seq(3, 3)), (2L, Seq(5))).toDF("doc_id", "tok_ids")
    val out = Torch.generatePromptLookup(df, "tok_ids", bc, ngram = 2,
        maxDraft = 2)
      .select("doc_id", "n_drafted", "n_accepted", "out_toks").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getInt(1) == 0 && r.getInt(2) == 0)
      assert(r.getSeq[Int](3).length == 1)
    }
  }

  test("q262: a periodic prompt drafts its own continuation (the copy-task win)") {
    val m = graft.SparkEntry.genModel
    val bc = spark.sparkContext.broadcast(m)
    // final bigram (1,2) first occurs at position 0; continuation 3,1
    val df = Seq((7L, Seq(1, 2, 3, 1, 2))).toDF("doc_id", "tok_ids")
    val out = Torch.generatePromptLookup(df, "tok_ids", bc, ngram = 2,
        maxDraft = 2).select("draft_toks").collect()
    assert(out.head.getSeq[Int](0).toSeq == Seq(3, 1))
  }

  test("q263 tree-draft: emitted == greedy prefix; tree == f64 recompute; rank-gap floors") {
    val tm = graft.SparkEntry.genModel
    val dm0 = TorchQuant.quantize(tm, 7)
    val vocab = tm.outDim
    val bcT = spark.sparkContext.broadcast(tm)
    val bcD = spark.sparkContext.broadcast(dm0)
    val toks = fixturePrompts(vocab)
    val td = Torch.treeDraftGreedy(toks, "tok_ids", bcT, bcD,
        branch = 2, depth = 2)
      .select("doc_id", "tok_ids", "tree", "n_accepted", "out_toks")
      .collect()
      .map(r => r.getLong(0) -> (
        r.getSeq[Int](1).toArray,
        r.getSeq[scala.collection.Seq[Int]](2).map(_.toSeq),
        r.getInt(3), r.getSeq[Int](4).toArray))
      .toMap
    val greedy = Torch.generateGreedy(toks, "tok_ids", "gen", bcT, steps = 3)
      .select("doc_id", "gen").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    def q6(x: Double): Double =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    def probs6(lg: Array[Float]): Array[Double] = {
      val mx = lg.map(_.toDouble).max
      val es = lg.map(v => math.exp(v.toDouble - mx))
      val z = es.sum
      es.map(e => q6(e / z))
    }
    var minG12 = Double.MaxValue // ordering boundary within the top-2
    var minG23 = Double.MaxValue // the set boundary (rank 2 vs 3)
    var full = 0
    for ((id, (prompt, tree, nAcc, out)) <- td) {
      assert(tree.length == 3, s"doc $id: ${tree.length} tree nodes")
      // recompute every node from the non-session forward (the
      // KV-session == recompute pin makes these the same logits)
      val rootP = probs6(dm0.forwardTokens(prompt))
      def top2(p6: Array[Double]) =
        (0 until vocab).sortBy(j => (-p6(j), j)).take(2)
      def gaps(p6: Array[Double]): Unit = {
        val o = (0 until vocab).sortBy(j => (-p6(j), j))
        val g12 = p6(o(0)) - p6(o(1))
        val g23 = p6(o(1)) - p6(o(2))
        if (g12 > 0) minG12 = math.min(minG12, g12)
        if (g23 > 0) minG23 = math.min(minG23, g23)
      }
      gaps(rootP)
      assert(tree(0) == top2(rootP), s"doc $id root children mismatch")
      for (b <- 0 to 1) {
        val childP = probs6(dm0.forwardTokens(prompt :+ tree(0)(b)))
        gaps(childP)
        assert(tree(b + 1) == top2(childP),
          s"doc $id child-$b children mismatch")
      }
      assert(out.length == nAcc + 1)
      assert(out.toSeq == greedy(id).take(nAcc + 1).toSeq,
        s"doc $id: emitted ${out.toSeq} not the greedy prefix")
      if (nAcc == 2) full += 1
    }
    info(s"q263 sf0.001: ${td.size} docs, $full full walks; " +
      s"min rank gaps g12=$minG12 g23=$minG23")
    // the oracle's p6 restatement is pure f64 against the engine's
    // f64-with-one-f32-rounding-per-op; a rank decision is safe when
    // every positive gap sits well above the 1e-6 grid step the
    // drift can flip. Measured on the fixture: g12 = 3.3e-3,
    // g23 = 9.2e-5 — pinned with ~2x margin.
    assert(minG12 >= 1e-3 && minG23 >= 4e-5,
      s"tree rank boundaries too thin: g12=$minG12 g23=$minG23")
    assert(full > 0 && full < td.size,
      "tree acceptance is degenerate (all-or-nothing) on the fixture")
  }

  test("q266 loop: emitted == greedy truncated; cycle 1 replays q262; cycle accounting") {
    val m = graft.SparkEntry.genModel
    val vocab = m.seqHead.get.vocab
    val bc = spark.sparkContext.broadcast(m)
    val toks = fixturePrompts(vocab)
    val loop = Torch.generatePromptLookupLoop(toks, "tok_ids", bc,
        ngram = 2, maxDraft = 2, maxNewTokens = 2)
      .select("doc_id", "out_toks", "n_cycles", "n_acc_total").collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Int](1).toSeq, r.getInt(2), r.getInt(3)))).toMap
    val single = Torch.generatePromptLookup(toks, "tok_ids", bc,
        ngram = 2, maxDraft = 2)
      .select("doc_id", "n_accepted", "out_toks").collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getSeq[Int](2).toSeq))).toMap
    val greedy = Torch.generateGreedy(toks, "tok_ids", "gen", bc, steps = 2)
      .select("doc_id", "gen").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(loop.nonEmpty && loop.keySet == single.keySet)
    for ((id, (out, nCyc, accTot)) <- loop) {
      val (nAcc1, out1) = single(id)
      assert(out == greedy(id),
        s"doc $id: loop emitted $out != greedy ${greedy(id)}")
      // cycle 1 IS q262: its emission is a prefix of the loop's
      assert(out.startsWith(out1.take(2)),
        s"doc $id: cycle 1 diverged from q262")
      // a cycle emits n_acc+1 tokens, so one cycle suffices iff
      // cycle 1 accepted at least one draft
      assert(nCyc == (if (nAcc1 >= 1) 1 else 2),
        s"doc $id: n_cycles $nCyc with cycle-1 n_acc $nAcc1")
      // cycle-level accounting only ever adds on top of cycle 1
      assert(accTot >= nAcc1)
    }
    val multi = loop.values.count(_._2 == 2)
    info(s"q266 sf0.001: ${loop.size} docs, $multi needed a second cycle")
    assert(multi > 0 && multi < loop.size,
      "cycle count is degenerate on the fixture")
  }

  test("q272 tree loop: emitted == greedy truncated; cycle 1 replays q263; cycle accounting") {
    val tm = graft.SparkEntry.genModel
    val bcT = spark.sparkContext.broadcast(tm)
    val bcD = spark.sparkContext.broadcast(TorchQuant.quantize(tm, 7))
    val toks = fixturePrompts(tm.outDim)
    val loop = Torch.treeDraftGreedyLoop(toks, "tok_ids", bcT, bcD,
        branch = 2, depth = 2, maxNewTokens = 2)
      .select("doc_id", "out_toks", "n_cycles", "n_acc_total").collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Int](1).toSeq, r.getInt(2), r.getInt(3)))).toMap
    val single = Torch.treeDraftGreedy(toks, "tok_ids", bcT, bcD,
        branch = 2, depth = 2)
      .select("doc_id", "n_accepted", "out_toks").collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getSeq[Int](2).toSeq))).toMap
    val greedy = Torch.generateGreedy(toks, "tok_ids", "gen", bcT, steps = 2)
      .select("doc_id", "gen").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(loop.nonEmpty && loop.keySet == single.keySet)
    for ((id, (out, nCyc, accTot)) <- loop) {
      val (nAcc1, out1) = single(id)
      assert(out == greedy(id),
        s"doc $id: loop emitted $out != greedy ${greedy(id)}")
      assert(out.startsWith(out1.take(2)),
        s"doc $id: cycle 1 diverged from q263")
      // a cycle emits n_acc+1 tokens: one cycle suffices iff cycle 1
      // accepted at least one level
      assert(nCyc == (if (nAcc1 >= 1) 1 else 2),
        s"doc $id: n_cycles $nCyc with cycle-1 n_acc $nAcc1")
      assert(accTot >= nAcc1)
    }
    val multi = loop.values.count(_._2 == 2)
    info(s"q272 sf0.001: ${loop.size} docs, $multi needed a second cycle")
    assert(multi > 0 && multi < loop.size,
      "tree-loop cycle count is degenerate on the fixture")
  }

  test("q269 multi-draft: numDrafts=1 replays q247 bit-exactly; all three arms live at b=2") {
    val tm = graft.SparkEntry.genModel
    val dm = TorchQuant.quantize(tm, 7)
    val bcT = spark.sparkContext.broadcast(tm)
    val bcD = spark.sparkContext.broadcast(dm)
    val toks = fixturePrompts(tm.outDim)
    // b = 1 shares every salt (d1, a1, r1) and every arm with q247's
    // single-draft kernel — same draft token, same acceptance, same
    // residual walk over the RAW masses
    val b1 = Torch.speculativeSampledMultiDraft(toks, "doc_id", "tok_ids",
        bcT, bcD, numDrafts = 1)
      .select("doc_id", "draft_toks", "acc_round", "final_tok").collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Int](1).head, r.getInt(2) == 1, r.getInt(3)))).toMap
    val q247 = Torch.speculativeSampled(toks, "doc_id", "tok_ids", bcT, bcD)
      .select("doc_id", "draft_tok", "accepted", "final_tok").collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(2), r.getInt(3)))).toMap
    assert(b1.nonEmpty && b1 == q247,
      "numDrafts = 1 diverged from speculativeSampled")
    val b2 = Torch.speculativeSampledMultiDraft(toks, "doc_id", "tok_ids",
        bcT, bcD, numDrafts = 2)
      .select("doc_id", "draft_toks", "acc_round", "final_tok").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2), r.getInt(3)))
    // round-1 decisions never move when a second draft is added (the
    // multi-round walk only EXTENDS the rejection path)
    assert(b2.forall { case (d, drafts, rnd, f) =>
      val (x1, acc1, _) = b1(d)
      drafts.head == x1 && (!acc1 || (rnd == 1 && f == x1))
    }, "adding a draft moved a round-1 decision")
    val hist = b2.groupBy(_._3).map { case (k, v) => k -> v.size }
    info(s"q269 sf0.001: acc_round histogram $hist")
    assert(Seq(0, 1, 2).forall(hist.getOrElse(_, 0) > 0),
      s"an acceptance arm never fired: $hist")
    // an accepted round emits its own draft
    assert(b2.forall { case (_, drafts, rnd, f) =>
      rnd == 0 || f == drafts(rnd - 1) })
  }

  test("q273 self-draft tree: emitted == greedy prefix; the weaker draft accepts strictly less") {
    val tm = graft.SparkEntry.genModel
    val bcT = spark.sparkContext.broadcast(tm)
    val bcInt8 = spark.sparkContext.broadcast(TorchQuant.quantize(tm, 7))
    val bcEE = spark.sparkContext.broadcast(graft.SparkEntry.earlyExitModel)
    val toks = fixturePrompts(tm.outDim)
    def run(d: org.apache.spark.broadcast.Broadcast[TorchScriptModel]) =
      Torch.treeDraftGreedy(toks, "tok_ids", bcT, d, branch = 2, depth = 2)
        .select("doc_id", "n_accepted", "out_toks").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toSeq))
    val greedy = Torch.generateGreedy(toks, "tok_ids", "gen", bcT, steps = 3)
      .select("doc_id", "gen").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val ee = run(bcEE)
    assert(ee.forall { case (d, n, out) =>
      out.length == n + 1 && out == greedy(d).take(n + 1) },
      "self-draft emission is not the greedy prefix")
    // the early-exit draft skips the transformer block, so it tracks
    // the target WORSE than the int8 quant — total accepted levels
    // must drop (the telemetry signal q273 exists to surface)
    val accEE = ee.map(_._2).sum
    val accInt8 = run(bcInt8).map(_._2).sum
    info(s"q273 sf0.001: early-exit accepted $accEE levels vs int8 $accInt8")
    assert(accEE < accInt8, "the early-exit draft out-accepted the int8 quant")
    assert(ee.map(_._2).distinct.size > 1, "degenerate acceptance mix")
  }

  test("q274 stochastic prompt-lookup: drafts match the greedy variant; accepted tokens are the drafts") {
    val tm = graft.SparkEntry.genModel
    val bc = spark.sparkContext.broadcast(tm)
    val toks = fixturePrompts(tm.outDim)
    val sampled = Torch.promptLookupSampled(toks, "doc_id", "tok_ids", bc,
        ngram = 2, maxDraft = 2)
      .select("doc_id", "draft_toks", "n_drafted", "n_accepted", "out_toks")
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1).toSeq, r.getInt(2),
        r.getInt(3), r.getSeq[Int](4).toSeq))).toMap
    val greedyPl = Torch.generatePromptLookup(toks, "tok_ids", bc,
        ngram = 2, maxDraft = 2)
      .select("doc_id", "draft_toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(sampled.nonEmpty && sampled.keySet == greedyPl.keySet)
    var accepted = 0
    for ((id, (drafts, nDrf, nAcc, out)) <- sampled) {
      // the lookup is verification-independent: same drafts as q262
      assert(drafts == greedyPl(id), s"doc $id: lookup diverged")
      assert(nDrf == drafts.length && out.length == nAcc + 1)
      // the accepted prefix IS the drafted prefix (acceptance emits
      // the draft; only the correction/bonus positions sample)
      assert(out.take(nAcc) == drafts.take(nAcc),
        s"doc $id: accepted tokens diverged from the drafts")
      if (nAcc > 0) accepted += 1
    }
    info(s"q274 sf0.001: ${sampled.size} docs, $accepted with acceptances")
    assert(accepted > 0, "no acceptance anywhere — vacuous verification")
  }

  test("q275 multi-draft loop: cycle 1 replays q269; every token is an accepted draft or a residual sample") {
    val tm = graft.SparkEntry.genModel
    val bcT = spark.sparkContext.broadcast(tm)
    val bcD = spark.sparkContext.broadcast(TorchQuant.quantize(tm, 7))
    val toks = fixturePrompts(tm.outDim)
    val loop = Torch.speculativeSampledMultiDraftLoop(toks, "doc_id",
        "tok_ids", bcT, bcD, numDrafts = 2, maxNewTokens = 2)
      .select("doc_id", "out_toks", "acc_rounds").collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Int](1).toSeq, r.getSeq[Int](2).toSeq))).toMap
    val cell = Torch.speculativeSampledMultiDraft(toks, "doc_id", "tok_ids",
        bcT, bcD, numDrafts = 2)
      .select("doc_id", "acc_round", "final_tok").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(loop.nonEmpty && loop.keySet == cell.keySet)
    for ((id, (out, rounds)) <- loop) {
      assert(out.length == 2 && rounds.length == 2)
      val (rnd1, f1) = cell(id)
      assert(out.head == f1 && rounds.head == rnd1,
        s"doc $id: cycle 1 diverged from the q269 cell")
      assert(rounds.forall(r => r >= 0 && r <= 2))
    }
    val rnd2Hist = loop.values.groupBy(_._2(1)).map { case (k, v) => k -> v.size }
    info(s"q275 sf0.001: position-2 acc_round histogram $rnd2Hist")
    assert(rnd2Hist.keys.size > 1, "position 2 acceptance is degenerate")
  }

  test("q277 typical tree: == f64 recompute; threshold margins floor; the plausibility dial bites") {
    val tm = graft.SparkEntry.genModel
    val dm0 = graft.SparkEntry.earlyExitModel
    val vocab = tm.outDim
    val bcT = spark.sparkContext.broadcast(tm)
    val bcD = spark.sparkContext.broadcast(dm0)
    val toks = fixturePrompts(vocab)
    val (eps, alpha) = (0.25, 0.5)
    val typ = Torch.treeDraftTypical(toks, "tok_ids", bcT, bcD,
        branch = 2, depth = 2, posteriorEps = eps, posteriorAlpha = alpha)
      .select("doc_id", "tok_ids", "tree", "n_accepted", "out_toks")
      .collect()
      .map(r => r.getLong(0) -> ((
        r.getSeq[Int](1).toArray,
        r.getSeq[scala.collection.Seq[Int]](2).map(_.toSeq),
        r.getInt(3), r.getSeq[Int](4).toSeq)))
      .toMap
    def q6(x: Double): Double =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    def probs6(lg: Array[Float]): Array[Double] = {
      val mx = lg.map(_.toDouble).max
      val es = lg.map(v => math.exp(v.toDouble - mx))
      val z = es.sum
      es.map(e => q6(e / z))
    }
    def thr6(pp: Array[Double]): Double = {
      val h = -pp.filter(_ > 0.0).map(p => p * StrictMath.log(p)).sum
      q6(math.min(eps, alpha * StrictMath.exp(-h)))
    }
    var minMargin = Double.MaxValue
    for ((id, (prompt, tree, nAcc, out)) <- typ) {
      // full f64 recompute of the typical walk over the ENGINE's tree
      var prefix = prompt
      var node = 0 // tree index of the current node's children
      var n = 0
      var stopped = false
      val expOut = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (n < 2 && !stopped) {
        val pp = probs6(tm.forwardTokens(prefix))
        val t = thr6(pp)
        tree(node).foreach(c =>
          minMargin = math.min(minMargin, math.abs(pp(c) - t)))
        val acc = tree(node).filter(c => pp(c) >= t)
        if (acc.isEmpty) stopped = true
        else {
          val c = acc.minBy(x => (-pp(x), x))
          expOut += c
          prefix = prefix :+ c
          node = 1 + tree(0).indexOf(c) // child block of the taken branch
          n += 1
        }
      }
      // the continuation is the raw-logit argmax (first max wins —
      // argmaxFirst's exact rule)
      val bonusLg = tm.forwardTokens(prefix)
      var best = 0
      for (j <- 1 until vocab) if (bonusLg(j) > bonusLg(best)) best = j
      expOut += best
      assert(nAcc == n && out == expOut.toSeq,
        s"doc $id: engine (n=$nAcc, $out) vs f64 (n=$n, ${expOut.toSeq})")
    }
    info(s"q277 sf0.001: min |p6 - thr6| margin $minMargin")
    // measured 4.35e-4 on the fixture — pinned with ~2x headroom so a
    // cross-libm exp/ln last-ulp can never flip an acceptance
    assert(minMargin >= 2e-4, s"typical threshold margin too thin: $minMargin")
    // the plausibility dial really differs from exact-match greedy
    // verification somewhere: typical accepts tolerated non-argmax
    // children
    val greedyTree = Torch.treeDraftGreedy(toks, "tok_ids", bcT, bcD,
        branch = 2, depth = 2)
      .select("doc_id", "n_accepted").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(typ.exists { case (d, (_, _, n, _)) => n != greedyTree(d) },
      "typical acceptance never diverged from exact-match — vacuous dial")
    val hist = typ.values.groupBy(_._3).map { case (k, v) => k -> v.size }
    info(s"q277 depth histogram: $hist")
    assert(Seq(0, 1, 2).forall(hist.getOrElse(_, 0) > 0),
      s"a depth arm never fired: $hist")
  }

  test("q263: an identity draft (draft eq target) accepts every level on the fixture") {
    val tm = graft.SparkEntry.genModel
    val bc = spark.sparkContext.broadcast(tm)
    val toks = fixturePrompts(tm.outDim)
    val out = Torch.treeDraftGreedy(toks, "tok_ids", bc, bc,
        branch = 2, depth = 2)
      .select("n_accepted").collect()
    assert(out.nonEmpty)
    // the target's argmax is the draft's p6-rank-1 child by
    // construction (softmax is monotone; quantization ties break by
    // tid on both pick rules) except under exact p6 ties the fixture
    // does not produce (the gap floor above)
    assert(out.forall(_.getInt(0) == 2),
      "identity draft rejected a level")
  }
}
