package graft.torch

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, min, sum, when}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/**
 * The engine's answer to the reference's `FunctionFactory` + `TorchUdf`
 * (reference src/lib.rs:23-100, src/udf.rs:20-287): turn a TorchScript
 * model URL into a registered Spark scalar function.
 *
 * Scale design: model weights are parsed ONCE on the driver and shipped
 * to executors via `sparkContext.broadcast` — never closure-captured per
 * task — so a multi-MB model crosses the wire once per executor, not
 * once per task.
 */
object Torch {

  /** The deterministic sampling kernel shared by [[generateSampled]]
    * and [[generateSampledPair]] — see generateSampled's scaladoc for
    * the full cross-engine contract (seeded md5 draws, 6-dp HALF_UP
    * quantization, order-defined running sums). */
  private object Sampling {
    def q6(x: Double): Double =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    def draw(id: Long, step: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$step".getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1e6
    }
    /** The watermark green-list membership (Kirchenbauer et al. 2023,
      * general gamma = num/den): token `j` is GREEN after `prev` iff
      * md5("<prev>:<j>")'s leading 32 bits mod `den` fall below `num`
      * — an exact integer predicate a SQL engine recomputes from the
      * same strings, so generation-side biasing and corpus-side
      * detection share one function at ANY rational green fraction.
      * (num, den) = (1, 2) is the original parity rule: `% 2 < 1`
      * ⟺ `% 2 == 0`, bit-for-bit the pre-gamma behavior. */
    def greenToken(prev: Int, j: Int, num: Int, den: Int): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$prev:$j".getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % den < num
    }
    def greenToken(prev: Int, j: Int): Boolean = greenToken(prev, j, 1, 2)
    /** The multi-return draw (`num_return_sequences`): sequence 0
      * keeps the single-return key `"<id>:<step>"` — so k = 1 and the
      * first of k sequences are bit-identical to [[generateSampled]]
      * — and every extra sequence salts the key with its index,
      * `"<id>:<seq>:<step>"`. */
    def draw(id: Long, seq: Int, step: Int): Double =
      if (seq == 0) draw(id, step)
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id:$seq:$step".getBytes("UTF-8"))
        val hex = md.take(4).map(b => f"$b%02x").mkString
        (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1e6
      }
    def sampleNext(out: Array[Float], off: Int, vocab: Int,
        temperature: Double, topP: Double, u: Double,
        banned: Set[Int] = Set.empty, topK: Int = Int.MaxValue,
        seen: Set[Int] = Set.empty, repPenalty: Double = 1.0,
        minP: Double = 0.0, typicalP: Double = 1.0,
        greenPrev: Int = -1, greenDelta: Double = 0.0,
        greenNum: Int = 1, greenDen: Int = 2,
        fusePrev: Int = -1, fuseWeight: Double = 0.0,
        fuseCnts: Array[Array[Long]] = null,
        fuseRows: Array[Long] = null): Int = {
      // constrained decoding: banned ids are removed BEFORE the
      // softmax (the -inf-mask semantics: the distribution renorms
      // over the allowed vocabulary; the oracle simply omits them
      // from the unpivot). ids stay ascending, so the full-vocab f64
      // accumulation order is unchanged when nothing is banned.
      // repetition penalty (CTRL): SEEN-token logits rescale in f64
      // BEFORE the temperature — `x > 0 → x/p else x·p` — exactly the
      // greedy path's adjustment, so the same oracle CASE restates it.
      val ids = (0 until vocab).filterNot(banned).toArray
      val lp = ids.map { j =>
        val x0 = out(off + j).toDouble
        val xp =
          if (seen(j)) { if (x0 > 0.0) x0 / repPenalty else x0 * repPenalty }
          else x0
        // soft watermark under sampling (Kirchenbauer et al. 2023's
        // deployment mode): the green logits gain +delta BEFORE the
        // temperature — the guarded branch keeps delta = 0
        // bit-identical to the unwatermarked path
        val x =
          if (greenDelta != 0.0 && greenPrev >= 0 &&
              greenToken(greenPrev, j, greenNum, greenDen))
            xp + greenDelta
          else xp
        // shallow fusion under sampling (the Gulcehre prior lifted
        // to the sampled chain): the frozen add-one bigram-LM term
        // adds BEFORE the temperature, like the watermark bias —
        // guarded so fuseWeight = 0 stays bit-exact
        val xf =
          if (fuseWeight != 0.0 && fusePrev >= 0)
            x + fuseWeight * StrictMath.log(
              (fuseCnts(fusePrev)(j) + 1L).toDouble /
                (fuseRows(fusePrev) + vocab.toLong).toDouble)
          else x
        xf / temperature
      }
      val mx = lp.max
      val es = lp.map(v => math.exp(v - mx))
      val z = es.sum
      val p6 = es.map(e => q6(e / z))
      val order = ids.indices.sortBy(i => (-p6(i), ids(i)))
      // nucleus: a candidate joins while the mass BEFORE it is < topP
      // AND its rank is within topK AND its own mass clears the min-p
      // floor `p6 >= minP·p6max` (Nguyen et al. 2024 — minP dyadic, so
      // the product is exact and the comparison lives on the 1e-6
      // grid). All three are prefix filters on the same
      // (p6 DESC, tid ASC) order — ties share a p6 value, so the
      // min-p cut never splits a tie — and each knob at its neutral
      // value (topP 1, topK >= |ids|, minP 0) reduces BIT-EXACTLY to
      // the others' path: the f64 running sums see identical terms in
      // identical order (spec-pinned).
      val pMax = p6(order.head)
      // TYPICAL sampling (Meister et al. 2022, HF `typical_p`): keep
      // the candidates whose surprise `-ln p` sits closest to the
      // step's entropy `H = -Σ p·ln p`, in deviation order, until the
      // kept mass reaches typicalP — locally-typical text, the
      // anti-"always the head OR the flat tail" filter. Deviations
      // quantize to the 6dp grid (tid tiebreak) so the keep boundary
      // never hinges on cross-engine last-ulp luck; the entropy sums
      // q6'd masses in ascending-tid order (zero-mass candidates
      // contribute the 0·ln 0 = 0 limit and are never kept — their
      // surprise is infinite). typicalP >= 1 is OFF (not a prefix of
      // the mass order, so "keep everything" is the only bit-exact
      // neutral) — the other knobs' paths are untouched.
      val typKeep: java.util.BitSet =
        if (typicalP >= 1.0) null
        else {
          var h = 0.0
          var i = 0
          while (i < p6.length) {
            if (p6(i) > 0.0) h -= p6(i) * StrictMath.log(p6(i))
            i += 1
          }
          val devOrder = ids.indices.filter(p6(_) > 0.0)
            .sortBy(i => (q6(math.abs(-StrictMath.log(p6(i)) - h)), ids(i)))
          val bs = new java.util.BitSet(p6.length)
          var dcum = 0.0
          for (i <- devOrder if dcum < typicalP) { bs.set(i); dcum += p6(i) }
          bs
        }
      val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
      var cum = 0.0
      for ((i, rk) <- order.zipWithIndex
           if cum < topP && rk < topK && p6(i) >= minP * pMax &&
             (typKeep == null || typKeep.get(i))) {
        kept += i; cum += p6(i)
      }
      // total == the last running sum (ORDER-DEFINED on both engines)
      var run = 0.0
      val sums = kept.map { i => run += p6(i); run }
      val total = run
      var pick = kept.last
      var done = false
      for ((i, cs) <- kept.zip(sums) if !done)
        if (q6(cs / total) > u) { pick = i; done = true }
      ids(pick)
    }
  }

  /** The SPECULATIVE-decoding kernel quartet shared by every spec*
    * method ([[speculativeSampled]], [[speculativeSampledGamma]],
    * [[speculativeSampledLoop]], [[speculativeSampledPair]],
    * [[speculativeSampledPairGamma]]) — hoisted so a fix to the pick
    * walk or the salt format lands in ONE place and the
    * gamma=1-replays-q247 / cycle-1-replays-q249 spec pins cannot
    * silently diverge across copies. Contract (see
    * speculativeSampled's scaladoc): distributions are full-vocab
    * softmaxes quantized to the 6dp grid; draws are independent md5
    * draws keyed `"<id>:spec:<salt>"` on the 1e-6 grid; the pick is
    * the order-defined renormalized-cumulative walk over
    * (mass DESC, tid ASC). */
  private object Spec extends Serializable {
    def q6(x: Double): Double =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    def draw(id: Long, salt: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:spec:$salt".getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1e6
    }
    def probs6(lg: Array[Float], vocab: Int): Array[Double] = {
      var mx = Double.NegativeInfinity
      var j = 0
      while (j < vocab) {
        val v = lg(j).toDouble
        if (v > mx) mx = v
        j += 1
      }
      var z = 0.0
      j = 0
      while (j < vocab) { z += math.exp(lg(j).toDouble - mx); j += 1 }
      Array.tabulate(vocab)(k => q6(math.exp(lg(k).toDouble - mx) / z))
    }
    /** The order-defined renormalized-cumulative pick over
      * (mass DESC, tid ASC) — exactly the q203 nucleus walk at
      * topP = 1 (so every positive-mass candidate is kept). */
    def pick(mass: Array[Double], u: Double): Int = {
      val order = mass.indices.filter(mass(_) > 0.0)
        .sortBy(j => (-mass(j), j))
      var run = 0.0
      val sums = order.map { j => run += mass(j); run }
      val total = run
      var chosen = order.last
      var done = false
      for ((j, cs) <- order.zip(sums) if !done)
        if (q6(cs / total) > u) { chosen = j; done = true }
      chosen
    }
    /** The MULTI-ROUND b-way verification walk (SpecInfer's recursive
      * rejection at ONE position) shared by
      * [[speculativeSampledMultiDraft]], its serving loop, and the
      * stochastic tree's per-level verification — hoisted per the
      * same rationale as the quartet above: a fix to the walk lands
      * in ONE place, so the cycle-1/branch-1 replay spec pins cannot
      * silently diverge. Round i accepts draft `x_i` w.p.
      * `min(1, p_i(x_i)/q(x_i))` (p_1 = the target's grid
      * distribution); a rejection updates `p_{i+1} = q6-normalized
      * max(0, p_i − q)` ONLY when a later round needs the ratio —
      * the final rejection's pick walks the RAW residual masses
      * (scale-invariant; b = 1 is bit-exactly q247's resid pick).
      * An all-zero residual (p_i == q on the grid) keeps the current
      * draft. Salts: acceptance i = `"a<saltOff+i>"` (1-based),
      * final residual = `"r<saltOff+b>"`.
      *
      * @return (accRound, finalTok): accRound = the 1-based round
      *         whose draft was accepted, 0 = residual-sampled (or
      *         the all-zero-residual keep) */
    def multiRoundWalk(drafts: Array[Int], qp: Array[Double],
        pp: Array[Double], vocab: Int, id: Long, saltOff: Int): (Int, Int) = {
      var cur = pp
      var accRound = 0
      var finalTok = -1
      var i = 0
      var done = false
      while (i < drafts.length && !done) {
        val x = drafts(i)
        val ratio = q6(math.min(1.0, cur(x) / qp(x)))
        if (draw(id, s"a${saltOff + i + 1}") < ratio) {
          accRound = i + 1; finalTok = x; done = true
        } else {
          val m = Array.tabulate(vocab)(j => math.max(0.0, cur(j) - qp(j)))
          if (m.forall(_ == 0.0)) {
            finalTok = x; done = true // p_i == q on the grid
          } else if (i + 1 < drafts.length) {
            var s = 0.0
            var j = 0
            while (j < vocab) { s += m(j); j += 1 }
            cur = Array.tabulate(vocab)(j => q6(m(j) / s))
          } else {
            finalTok = pick(m, draw(id, s"r${saltOff + drafts.length}"))
            done = true
          }
        }
        i += 1
      }
      (accRound, finalTok)
    }
  }

  /** The prompt-lookup draft (Saxena 2023, HF `prompt_lookup_num_
    * tokens`) shared by [[generatePromptLookup]],
    * [[promptLookupSampled]], and [[generatePromptLookupLoop]] —
    * hoisted so the match discipline (EARLIEST earlier occurrence of
    * the final `ngram` wins, the pattern occurrence itself never
    * matches — strict `start + ngram − 1 < L − ngram + ...` bound via
    * `i < patStart` — and the draft slice clamps to `maxDraft`) is
    * single-sourced across the three decode modes. */
  private def lookupDraft(full: scala.collection.IndexedSeq[Int],
      ngram: Int, maxDraft: Int): Array[Int] = {
    val L = full.length
    if (L <= ngram) return Array.emptyIntArray
    val patStart = L - ngram
    var matchAt = -1
    var i = 0
    while (matchAt < 0 && i < patStart) {
      var k = 0
      var eq = true
      while (eq && k < ngram) {
        if (full(i + k) != full(patStart + k)) eq = false else k += 1
      }
      if (eq) matchAt = i else i += 1
    }
    if (matchAt < 0) Array.emptyIntArray
    else Array.tabulate(
      math.min(maxDraft, L - matchAt - ngram))(k => full(matchAt + ngram + k))
  }

  /** The constrained beam-candidate expansion shared by [[beamSearch]]
    * and [[beamSearchPair]] — one live beam's candidate rows under the
    * full logit-constraint set, applied in the HF beam-search order:
    * constraints act on the per-beam LOG-SOFTMAX scores `lp` (the
    * full-vocab logsumexp is computed BEFORE any constraint, so the
    * neutral-knob scores are bit-identical to the unconstrained path);
    * SEEN tokens (anywhere in `full` = prompt/decoder-prefix +
    * generated) rescale `lp > 0 → lp/penalty else lp·penalty` (lp is a
    * log-prob, so the multiply arm always fires — the CASE keeps the
    * generateGreedy shape the oracle restates); static bans, banned-
    * phrase completions against `full`'s suffix, and eos-below-
    * `minNewTokens` are HARD (never candidates, never compete for
    * width slots); the no-repeat-n-gram ban LIFTS when it would empty
    * this beam's allowed set (q213's rule, evaluated PER BEAM). */
  private object Beams {
    def expand[B](lp: Array[Double], full: scala.collection.IndexedSeq[Int],
        genLen: Int, s0: Double, penLen: Double, bi: Int, ref: B,
        banned: Set[Int], repetitionPenalty: Double, noRepeatNgram: Int,
        bannedPhrases: Seq[Seq[Int]], eosId: Int, minNewTokens: Int)
        : scala.collection.immutable.IndexedSeq[(Double, Int, Int, Double, B)] = {
      val vocab = lp.length
      def completesPhrase(j: Int): Boolean =
        bannedPhrases.exists { ph =>
          ph.last == j && ph.length - 1 <= full.length &&
            full.takeRight(ph.length - 1) == ph.init
        }
      def hardBanned(j: Int): Boolean =
        banned.contains(j) || completesPhrase(j) ||
          (eosId >= 0 && j == eosId && genLen < minNewTokens)
      val ngBanned: Set[Int] =
        if (noRepeatNgram >= 2 && full.length >= noRepeatNgram - 1) {
          val n1 = noRepeatNgram - 1
          val suffix = full.takeRight(n1)
          (0 to full.length - noRepeatNgram).iterator.collect {
            case i if (0 until n1).forall(k => full(i + k) == suffix(k)) =>
              full(i + n1)
          }.toSet
        } else Set.empty
      val seen: Set[Int] =
        if (repetitionPenalty != 1.0) full.toSet else Set.empty
      val ngLive = (0 until vocab).exists(j => !hardBanned(j) && !ngBanned(j))
      (0 until vocab).collect {
        case tok if !hardBanned(tok) && !(ngLive && ngBanned(tok)) =>
          val l0 = lp(tok)
          val l =
            if (seen(tok)) {
              if (l0 > 0.0) l0 / repetitionPenalty
              else l0 * repetitionPenalty
            } else l0
          val raw = s0 + l
          (raw / penLen, bi, tok, raw, ref)
      }
    }
  }

  /**
   * Programmatic equivalent of
   * `CREATE FUNCTION name(IN[]) RETURNS OUT[] LANGUAGE TORCH AS 'url'`
   * (reference src/lib.rs:23-100). Supported (input, return) item-type
   * combinations mirror the reference's dispatch (udf.rs:28-57):
   * (F32,F32), (F64,F32), (F64,F64) — anything else errors like
   * udf.rs:59-64. Divergence (documented): the reference's (F64,F64) arm
   * actually constructs an F32-returning UDF (udf.rs:49-57, a bug); we
   * implement the declared semantics and really return `array<double>`.
   *
   * The device/batch_size configuration is snapshotted NOW, mirroring
   * "function binds its device at creation time" (lib.rs:51-56, 81-84).
   */
  def createFunction(
      spark: SparkSession,
      name: String,
      url: String,
      inputType: DataType = FloatType,
      returnType: DataType = FloatType): TorchScriptModel = {
    // reject unsupported type combinations BEFORE the expensive model
    // load/broadcast (multi-MB parse + executor ship on the error path)
    val f64Return = (inputType, returnType) match {
      case (FloatType | DoubleType, FloatType) => false
      case (DoubleType, DoubleType) => true
      case other =>
        throw new UnsupportedOperationException(
          s"data type combination not supported: $other (supported: " +
            "(float,float), (double,float), (double,double))")
    }
    val conf = TorchConf.get(spark) // validates; binds at creation time
    require(conf.device == "cpu", s"device ${conf.device} not available")
    val model = TorchScriptModel.load(url)
    val bc = spark.sparkContext.broadcast(model)
    // The closures declare Seq[java.lang.Double] input: boxed, because
    // Spark's deserializer asserts NOT_NULL on primitive Seq[Double]
    // elements before the lambda even runs. Spark's analyzer will only
    // UP-cast UDF arguments (array<float> -> array<double> is implicit;
    // the reverse is refused under ANSI), so accepting double and
    // narrowing to f32 here reproduces the reference's implicit
    // list<f64> -> list<f32> coercion at the UDF boundary
    // (reference src/udf.rs:108-115) for both float and double columns.
    // Null contract: null array OR any null element -> null output.
    def toF32(xs: scala.collection.Seq[java.lang.Double]): Array[Float] = {
      if (xs == null) return null
      val in = new Array[Float](xs.length)
      var i = 0
      while (i < in.length) {
        val d = xs(i)
        if (d == null) return null
        in(i) = d.floatValue()
        i += 1
      }
      in
    }
    // token-input (embedding-head) models take a variable-length
    // token-id row; ids arrive through the same numeric-array UDF
    // boundary and are truncated to int for the lookup
    def toTokens(xs: scala.collection.Seq[java.lang.Double]): Array[Int] = {
      if (xs == null) return null
      val in = new Array[Int](xs.length)
      var i = 0
      while (i < in.length) {
        val d = xs(i)
        if (d == null) return null
        in(i) = d.intValue()
        i += 1
      }
      in
    }
    val tokenInput = model.inDim == -1
    def run(xs: scala.collection.Seq[java.lang.Double]): Array[Float] =
      if (tokenInput) {
        val t = toTokens(xs)
        if (t == null) null else bc.value.forwardTokens(t)
      } else {
        val in = toF32(xs)
        if (in == null) null else bc.value.forward(in)
      }
    // a TWO-INPUT (encoder-decoder cross-attention) archive registers
    // as a 2-ARG scalar function: f(decoder_tokens, source_tokens) —
    // null either side (or any null element) -> null output
    def run2(qs: scala.collection.Seq[java.lang.Double],
        ks: scala.collection.Seq[java.lang.Double]): Array[Float] = {
      val q = toTokens(qs)
      val k = toTokens(ks)
      if (q == null || k == null || q.isEmpty || k.isEmpty) null
      else bc.value.forwardTokensPair(q, k)
    }
    if (model.isCross) {
      if (f64Return)
        spark.udf.register(name, (qs: scala.collection.Seq[java.lang.Double],
            ks: scala.collection.Seq[java.lang.Double]) => {
          val out = run2(qs, ks)
          if (out == null) null else out.map(_.toDouble).toSeq
        })
      else
        spark.udf.register(name, (qs: scala.collection.Seq[java.lang.Double],
            ks: scala.collection.Seq[java.lang.Double]) => {
          val out = run2(qs, ks)
          if (out == null) null else out.toSeq
        })
    } else if (f64Return)
      spark.udf.register(name, (xs: scala.collection.Seq[java.lang.Double]) => {
        val out = run(xs)
        if (out == null) null else out.map(_.toDouble).toSeq
      })
    else
      spark.udf.register(name, (xs: scala.collection.Seq[java.lang.Double]) => {
        val out = run(xs)
        if (out == null) null else out.toSeq
      })
    model
  }

  /**
   * Batched inference: appends `outputCol: array<float>` computed by one
   * GEMM per `batchSize` input rows — the scale path that amortizes
   * per-call overhead exactly like the reference's batch loop
   * (reference src/udf.rs:191-222, 250-286; partial final batch
   * semantics per udf.rs:202-204). `batchSize <= 0` reads
   * `torchfusion.batch_size` from the session.
   *
   * Uses `mapPartitions` over the row iterator: streaming, no
   * per-partition materialization beyond one batch.
   */
  def inferBatched(
      df: DataFrame,
      inputCol: String,
      outputCol: String,
      model: Broadcast[TorchScriptModel],
      batchSize: Int = -1): DataFrame = {
    val spark = df.sparkSession
    val bs =
      if (batchSize > 0) batchSize
      else TorchConf.get(spark).batchSize
    // token-input (embedding-head) models read int token ids; feature
    // models read f32 vectors (pixel models go through inferImageBatched)
    require(model.value.imageHead.isEmpty,
      "pixel-input model: use Torch.inferImageBatched")
    val tokenInput = model.value.inDim == -1
    val withFloats = graft.Spread(df).withColumn(inputCol, col(inputCol).cast(
      if (tokenInput) ArrayType(IntegerType) else ArrayType(FloatType)))
    val schema = StructType(withFloats.schema.fields :+
      StructField(outputCol, ArrayType(FloatType), nullable = true))
    val inIdx = withFloats.schema.fieldIndex(inputCol)
    // Dataset-typed mapPartitions (NOT df.rdd + createDataFrame): one
    // logical plan, no ExistingRDD rescan or extra job boundary; the
    // grouped(bs) GEMM batching below is unchanged
    withFloats.mapPartitions { it =>
      val m = model.value
      val inDim = m.inDim
      val outDim = m.outDim
      it.grouped(bs).flatMap { rows =>
        // null inputs (null array or any null element) stay out of the
        // GEMM batch and yield null output
        def floats(r: Row): Array[Float] = {
          if (r.isNullAt(inIdx)) return null
          val xs = r.getSeq[Any](inIdx)
          require(xs.length == inDim, s"expected $inDim features, got ${xs.length}")
          val a = new Array[Float](inDim)
          var j = 0
          while (j < inDim) {
            xs(j) match {
              case null => return null
              case f: java.lang.Number => a(j) = f.floatValue()
            }
            j += 1
          }
          a
        }
        // variable-length token rows: no length requirement — pooling
        // is per-row, the GEMM batch is the pooled (n, embDim) matrix
        def tokens(r: Row): Array[Int] = {
          if (r.isNullAt(inIdx)) return null
          val xs = r.getSeq[Any](inIdx)
          val a = new Array[Int](xs.length)
          var j = 0
          while (j < a.length) {
            xs(j) match {
              case null => return null
              case f: java.lang.Number => a(j) = f.intValue()
            }
            j += 1
          }
          a
        }
        // null inputs stay null in the output; live rows take their
        // forward-pass slice in order (one shared assembly for both
        // input shapes)
        def emit(inputs: Seq[AnyRef], out: Array[Float]): Iterator[Row] = {
          var k = -1
          rows.iterator.zip(inputs.iterator).map { case (r, in) =>
            if (in == null) Row.fromSeq(r.toSeq :+ null)
            else {
              k += 1
              Row.fromSeq(r.toSeq :+ out.slice(k * outDim, (k + 1) * outDim).toSeq)
            }
          }
        }
        if (tokenInput) {
          val inputs = rows.map(tokens)
          val live = inputs.filter(_ != null).toArray
          val out = if (live.nonEmpty) m.forwardTokensBatch(live) else Array.empty[Float]
          emit(inputs, out)
        } else {
          val inputs = rows.map(floats)
          val live = inputs.filter(_ != null)
          val n = live.size
          val flat = new Array[Float](n * inDim)
          var i = 0
          while (i < n) {
            System.arraycopy(live(i), 0, flat, i * inDim, inDim)
            i += 1
          }
          val out = if (n > 0) m.forwardBatch(flat, n) else Array.empty[Float]
          emit(inputs, out)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * Batched TWO-SEQUENCE inference for CROSS-ATTENTION models
   * (encoder-decoder: `queryCol` feeds the main/decoder-side token
   * sequence, `keyCol` the encoder leg whose output every
   * [[CrossAttnOp]] attends over). Appends `outputCol: array<float>`.
   * Same scan-side `mapPartitions` shape as [[inferBatched]] — weights
   * ride the broadcast once per executor, the per-row sequence phase
   * runs in the partition, the flat tail as one GEMM per batch; no
   * shuffle at any corpus size. Null inputs (either side, or any null
   * element, or an empty row) yield null output.
   */
  def inferPairBatched(
      df: DataFrame,
      queryCol: String,
      keyCol: String,
      outputCol: String,
      model: Broadcast[TorchScriptModel],
      batchSize: Int = -1): DataFrame = {
    val spark = df.sparkSession
    val bs =
      if (batchSize > 0) batchSize
      else TorchConf.get(spark).batchSize
    require(model.value.isCross, "not a cross-attention model: use inferBatched")
    val withInts = graft.Spread(df)
      .withColumn(queryCol, col(queryCol).cast(ArrayType(IntegerType)))
      .withColumn(keyCol, col(keyCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outputCol, ArrayType(FloatType), nullable = true))
    val qIdx = withInts.schema.fieldIndex(queryCol)
    val kIdx = withInts.schema.fieldIndex(keyCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val outDim = m.outDim
      it.grouped(bs).flatMap { rows =>
        def tokens(r: Row, idx: Int): Array[Int] = {
          if (r.isNullAt(idx)) return null
          val xs = r.getSeq[Any](idx)
          if (xs.isEmpty) return null
          val a = new Array[Int](xs.length)
          var j = 0
          while (j < a.length) {
            xs(j) match {
              case null => return null
              case f: java.lang.Number => a(j) = f.intValue()
            }
            j += 1
          }
          a
        }
        val pairs = rows.map(r => (tokens(r, qIdx), tokens(r, kIdx)))
        val live = pairs.filter(p => p._1 != null && p._2 != null).toArray
        val out =
          if (live.nonEmpty)
            m.forwardTokensPairBatch(live.map(_._1), live.map(_._2))
          else Array.empty[Float]
        var k = -1
        rows.iterator.zip(pairs.iterator).map { case (r, (q0, k0)) =>
          if (q0 == null || k0 == null) Row.fromSeq(r.toSeq :+ null)
          else {
            k += 1
            Row.fromSeq(r.toSeq :+ out.slice(k * outDim, (k + 1) * outDim).toSeq)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * Batched PIXEL-input inference (vision-classifier head): `inputCol`
   * is a BINARY column of channel-major u8 pixels — exactly what
   * [[graft.operators.Multimodal]]'s PixelDecoder/resizeImage emit —
   * normalized `v/255` (torchvision ToTensor's convention) into the
   * model's `(c, h, w)` input. The conv/pool phase runs per row, the
   * flat tail as one batched GEMM. Null or wrong-size payloads yield
   * null output (decode-failure rows survive the pipeline). Weights
   * ride the broadcast once per executor, like the other paths.
   */
  def inferImageBatched(
      df: DataFrame,
      inputCol: String,
      outputCol: String,
      model: Broadcast[TorchScriptModel],
      c: Int, h: Int, w: Int,
      batchSize: Int = -1): DataFrame = {
    val spark = df.sparkSession
    val bs =
      if (batchSize > 0) batchSize
      else TorchConf.get(spark).batchSize
    require(model.value.imageHead.isDefined, "not a pixel-input model")
    val schema = StructType(df.schema.fields :+
      StructField(outputCol, ArrayType(FloatType), nullable = true))
    val inIdx = df.schema.fieldIndex(inputCol)
    graft.Spread(df).mapPartitions { it =>
      val m = model.value
      val outDim = m.outDim
      it.grouped(bs).flatMap { rows =>
        def pixels(r: Row): Array[Float] = {
          if (r.isNullAt(inIdx)) return null
          val bytes = r.getAs[Array[Byte]](inIdx)
          if (bytes == null || bytes.length != c * h * w) return null
          val a = new Array[Float](bytes.length)
          var j = 0
          while (j < a.length) { a(j) = ((bytes(j) & 0xff) / 255.0).toFloat; j += 1 }
          a
        }
        val inputs = rows.map(pixels)
        val live = inputs.filter(_ != null).toArray
        val out = if (live.nonEmpty) m.forwardImageBatch(live, c, h, w) else Array.empty[Float]
        var k = -1
        rows.iterator.zip(inputs.iterator).map { case (r, in) =>
          if (in == null) Row.fromSeq(r.toSeq :+ null)
          else {
            k += 1
            Row.fromSeq(r.toSeq :+ out.slice(k * outDim, (k + 1) * outDim).toSeq)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * Batched language-model perplexity scoring (the CCNet-style quality
   * filter): `inputCol` is an `array<int>` token-id column; appends
   * `outputCol: double` = the model's mean next-token NLL under teacher
   * forcing ([[TorchScriptModel.lmMeanNll]] — exp of it is the
   * perplexity). Rows with a null input, a null element, or fewer than
   * 2 tokens (no prediction to score) yield null. Stateless scan-side
   * projection over the broadcast weights — the same one-plan
   * `mapPartitions` shape as [[inferBatched]], so it runs unchanged on
   * a streaming frame and shuffles nothing at any corpus size.
   */
  def scoreLmBatched(
      df: DataFrame,
      inputCol: String,
      outputCol: String,
      model: Broadcast[TorchScriptModel]): DataFrame = {
    val withInts = graft.Spread(df).withColumn(inputCol, col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outputCol, DoubleType, nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val m = model.value
      it.map { r =>
        val toks: Array[Int] =
          if (r.isNullAt(inIdx)) null
          else {
            val xs = r.getSeq[Any](inIdx)
            val a = new Array[Int](xs.length)
            var j = 0
            var ok = true
            while (ok && j < a.length) {
              xs(j) match {
                case null => ok = false
                case f: java.lang.Number => a(j) = f.intValue(); j += 1
              }
            }
            if (ok) a else null
          }
        if (toks == null || toks.length < 2) Row.fromSeq(r.toSeq :+ null)
        else Row.fromSeq(r.toSeq :+ m.lmMeanNll(toks))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * Batched seq2seq quality scoring — appends `outputCol: double` =
   * [[TorchScriptModel.seq2seqMeanNll]] (teacher-forced mean
   * next-token NLL of the decoder tokens given the source), the
   * parallel-corpus noisy-pair filter. Rows with a null input, a null
   * element, or fewer than 2 decoder tokens yield null. Stateless
   * scan-side `mapPartitions` over broadcast weights — the
   * [[scoreLmBatched]] shape, shuffle-free at any corpus size.
   */
  def scoreSeq2SeqBatched(
      df: DataFrame,
      queryCol: String,
      keyCol: String,
      outputCol: String,
      model: Broadcast[TorchScriptModel]): DataFrame = {
    val withInts = graft.Spread(df)
      .withColumn(queryCol, col(queryCol).cast(ArrayType(IntegerType)))
      .withColumn(keyCol, col(keyCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outputCol, DoubleType, nullable = true))
    val qIdx = withInts.schema.fieldIndex(queryCol)
    val kIdx = withInts.schema.fieldIndex(keyCol)
    withInts.mapPartitions { it =>
      val m = model.value
      def toks(r: Row, idx: Int): Array[Int] = {
        if (r.isNullAt(idx)) return null
        val xs = r.getSeq[Any](idx)
        val a = new Array[Int](xs.length)
        var j = 0
        while (j < a.length) {
          xs(j) match {
            case null => return null
            case f: java.lang.Number => a(j) = f.intValue()
          }
          j += 1
        }
        a
      }
      it.map { r =>
        val d = toks(r, qIdx)
        val k = toks(r, kIdx)
        if (d == null || k == null || d.length < 2 || k.isEmpty)
          Row.fromSeq(r.toSeq :+ null)
        else Row.fromSeq(r.toSeq :+ m.seq2seqMeanNll(d, k))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * Beam-search decoding — `steps` rounds of (forward pass on every
   * live beam → per-beam log-softmax → joint-score expansion → keep
   * the top `width`). Scores are f64 log-probs accumulated from the
   * f32 logits (`lp = logit − logsumexp`), candidates order by
   * (joint score DESC, parent-beam rank ASC, token ASC) — a total
   * order both engines can restate, so beam identity never hinges on
   * hash-map luck; the numeric margins get a spec-pinned floor like
   * every argmax in this repo.
   *
   * Scale shape: ALL beams of ALL rows in a GEMM batch run through
   * ONE `forwardTokensBatch` per step inside one `mapPartitions` —
   * rows×width sequences per call, no per-step plan growth.
   *
   * `eosId`/`lengthPenalty` add the VARIABLE-LENGTH hypothesis rules
   * (the GNMT/T5 inference defaults): a beam whose kept token is
   * `eosId` is COMPLETE — it stops expanding and competes for width
   * slots as its own single candidate (tie-break token −1) — and every
   * candidate ranks by `raw / len^α` (`StrictMath.pow`; α = 0.5 hits
   * fdlibm's exact `sqrt` arm), the length normalization that decides
   * which beam wins once lengths diverge. Defaults (α = 0, eos −1)
   * reduce BIT-EXACTLY to raw joint ranking: `pow(len, 0) = 1` and
   * `raw / 1.0 == raw` (spec-pinned). The knobs require the KV-session
   * path (cacheable non-cross models — the serving shapes).
   *
   * @return input columns + `outCol` = array<array<int>>: the kept
   *         beams' generated tokens in rank order (a completed beam's
   *         array ends at its eos; null input → null)
   */
  def beamSearch(
      df: DataFrame,
      inputCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      width: Int,
      batchSize: Int = -1,
      lengthPenalty: Double = 0.0,
      eosId: Int = -1,
      banned: Set[Int] = Set.empty,
      repetitionPenalty: Double = 1.0,
      noRepeatNgram: Int = 0,
      bannedPhrases: Seq[Seq[Int]] = Nil,
      minNewTokens: Int = 0,
      watermarkDelta: Double = 0.0,
      watermarkGamma: (Int, Int) = (1, 2),
      lmWeight: Double = 0.0,
      lmCounts: Array[Array[Long]] = null): DataFrame = {
    require(steps >= 1 && width >= 1, "steps and width must be >= 1")
    require(watermarkDelta >= 0.0, "watermarkDelta must be >= 0")
    require(lmWeight >= 0.0, "lmWeight must be >= 0")
    require(watermarkGamma._1 >= 1 && watermarkGamma._1 < watermarkGamma._2,
      "watermarkGamma must be a fraction num/den with 0 < num < den")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1, "beamSearch needs a token-input model")
    require(!model.value.isCross, "cross-attention model: use beamSearchPair")
    require(width <= model.value.outDim, "width exceeds the vocabulary")
    require(lengthPenalty >= 0.0, "lengthPenalty must be >= 0")
    require(eosId < model.value.outDim, "eosId exceeds the vocabulary")
    require(banned.size < model.value.outDim,
      "banned set covers the whole vocabulary")
    require(repetitionPenalty > 0.0, "repetitionPenalty must be > 0")
    require(noRepeatNgram == 0 || noRepeatNgram >= 2,
      "noRepeatNgram must be 0 (off) or >= 2")
    require(bannedPhrases.forall(_.nonEmpty), "empty banned phrase")
    require(minNewTokens >= 0, "minNewTokens must be >= 0")
    require(minNewTokens == 0 || eosId >= 0,
      "minNewTokens needs an eosId to suppress")
    val plainKnobs = banned.isEmpty && repetitionPenalty == 1.0 &&
      noRepeatNgram == 0 && bannedPhrases.isEmpty && minNewTokens == 0
    require((plainKnobs && lengthPenalty == 0.0 && eosId < 0 &&
      watermarkDelta == 0.0) || model.value.cacheable,
      "lengthPenalty/eosId/constraint/watermark knobs need the KV-session " +
        "path (cacheable model)")
    // the watermark BIASES the raw logits before the per-beam
    // log-softmax (the Kirchenbauer deployment order — the lse itself
    // shifts), which the logit-processor constraint chain does not
    // model; composing them is out of scope (length penalty and eos
    // compose fine — they act on the biased scores downstream)
    require(watermarkDelta == 0.0 || plainKnobs,
      "watermarkDelta does not compose with the constraint knobs")
    // SHALLOW FUSION under beams (Gulcehre et al. 2015 — where
    // production LM fusion actually rides): each live candidate's
    // log-softmax score gains `lmWeight · ln p_LM(tok | prev)` from
    // the frozen add-one bigram prior ([[generateGreedyFused]]'s
    // exact term, prev = the beam's OWN last token), and the fused
    // value accumulates into the running joint — so the prior steers
    // both ranking and which hypotheses survive. Composes with
    // lengthPenalty/eos (downstream normalizations of the fused raw)
    // AND with the watermark (the bias acts pre-lse on the logits,
    // the prior post-lse on the scores — independent slots, the
    // watermarked-fused serving stack); the constraint chain is out
    // of scope.
    require(lmWeight == 0.0 || (plainKnobs && model.value.cacheable),
      "lmWeight needs the KV path and does not compose with the " +
        "constraint knobs")
    val vocabN = model.value.outDim
    require(lmWeight == 0.0 || (lmCounts != null &&
      lmCounts.length == vocabN && lmCounts.forall(_.length == vocabN)),
      "lmCounts must be vocab x vocab when lmWeight > 0")
    // frozen-ingest broadcast convention (see generateGreedyFused)
    val bcLm: Broadcast[(Array[Array[Long]], Array[Long])] =
      if (lmWeight == 0.0) null
      else spark.sparkContext.broadcast((lmCounts, lmCounts.map(_.sum)))
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(ArrayType(IntegerType)), nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      val lm = if (bcLm == null) null else bcLm.value
      // the fused prior term: lmWeight · ln((cnt+1)/(rowSum+V)) —
      // generateGreedyFused's exact f64 expression, 0 when fusion is
      // off (guarded so the unfused path stays bit-exact)
      def fused(prev: Int, tok: Int): Double =
        lmWeight * StrictMath.log(
          (lm._1(prev)(tok) + 1L).toDouble /
            (lm._2(prev) + vocab.toLong).toDouble)
      def logProbs(out: Array[Float], off: Int): Array[Double] = {
        var mx = Double.NegativeInfinity
        var j = 0
        while (j < vocab) {
          val v = out(off + j).toDouble
          if (v > mx) mx = v
          j += 1
        }
        var z = 0.0
        j = 0
        while (j < vocab) { z += math.exp(out(off + j).toDouble - mx); j += 1 }
        val lse = math.log(z) + mx
        Array.tabulate(vocab)(k => out(off + k).toDouble - lse)
      }
      // watermarked scores: green logits (membership keyed on the
      // BEAM's last token) gain +delta BEFORE the log-softmax — the
      // lse shifts with the bias, exactly the greedy watermark's
      // deployment order lifted to per-beam distributions. The
      // guarded delta = 0 call path keeps the unwatermarked beams
      // bit-exact.
      def logProbsBiased(out: Array[Float], prev: Int): Array[Double] = {
        val adj = Array.tabulate(vocab) { j =>
          if (Sampling.greenToken(prev, j, watermarkGamma._1, watermarkGamma._2))
            out(j).toDouble + watermarkDelta
          else out(j).toDouble
        }
        var mx = Double.NegativeInfinity
        var j = 0
        while (j < vocab) { if (adj(j) > mx) mx = adj(j); j += 1 }
        var z = 0.0
        j = 0
        while (j < vocab) { z += math.exp(adj(j) - mx); j += 1 }
        val lse = math.log(z) + mx
        Array.tabulate(vocab)(k => adj(k) - lse)
      }
      it.grouped(bs).flatMap { rows =>
        val prompts: Array[Array[Int]] = rows.map { r =>
          if (r.isNullAt(inIdx)) null
          else {
            val xs = r.getSeq[Any](inIdx)
            val a = new Array[Int](xs.length)
            var j = 0
            var ok = true
            while (ok && j < a.length) {
              xs(j) match {
                case null => ok = false
                case f: java.lang.Number => a(j) = f.intValue(); j += 1
              }
            }
            if (ok && a.nonEmpty) a else null
          }
        }.toArray
        if (m.cacheable && !m.isCross) {
          // KV-cache beams: each beam owns a decode session; expansion
          // FORKS the parent (O(L) pointer copy, no prompt replay).
          // Logits are bit-identical to the recompute path, so beam
          // identity and ranking are unchanged (TorchGenerateSpec).
          // Beam state: (generated, RAW joint log-prob, session, done).
          rows.iterator.zip(prompts.iterator).map { case (r, p) =>
            if (p == null) Row.fromSeq(r.toSeq :+ null)
            else {
              var beams: Seq[(Vector[Int], Double, m.DecodeSession, Boolean)] =
                Seq((Vector.empty[Int], 0.0, m.decodeSession(p), false))
              var t = 0
              while (t < steps && beams.exists(!_._4)) {
                // candidates = (norm, parent rank, token, raw, parent):
                // live beams expand over the vocab at length+1; a
                // COMPLETED beam is its own single candidate (token −1,
                // its frozen raw score over its own length) competing
                // for a width slot — the GNMT completed-hypothesis rule
                val cands = beams.zipWithIndex.flatMap {
                  case ((g, s0, sess, true), bi) =>
                    Seq((s0 / StrictMath.pow(g.length.toDouble, lengthPenalty),
                      bi, -1, s0, (g, s0, sess, true)))
                  case ((g, s0, sess, false), bi) =>
                    val lp =
                      if (watermarkDelta == 0.0) logProbs(sess.logits(), 0)
                      else logProbsBiased(sess.logits(),
                        if (g.nonEmpty) g.last else p.last)
                    val pen =
                      StrictMath.pow((g.length + 1).toDouble, lengthPenalty)
                    if (plainKnobs)
                      (0 until vocab).map { tok =>
                        val raw =
                          if (lmWeight == 0.0) s0 + lp(tok)
                          else s0 + lp(tok) +
                            fused(if (g.nonEmpty) g.last else p.last, tok)
                        (raw / pen, bi, tok, raw, (g, s0, sess, false))
                      }
                    else {
                      // the HF beam processor order: constraints apply
                      // to the per-beam LOG-SOFTMAX scores (the full-
                      // vocab lse above is untouched — bit-identical
                      // to the unconstrained path); hard-banned
                      // candidates never compete for width slots, the
                      // n-gram ban LIFTS when it would empty this
                      // beam's allowed set (q213's rule, per beam)
                      val full = scala.collection.immutable.ArraySeq
                        .unsafeWrapArray(p) ++ g
                      Beams.expand(lp, full, g.length, s0, pen, bi,
                        (g, s0, sess, false), banned, repetitionPenalty,
                        noRepeatNgram, bannedPhrases, eosId, minNewTokens)
                    }
                }
                require(cands.nonEmpty,
                  "no decodable candidate: hard bans emptied every live " +
                    "beam's vocabulary")
                beams = cands.sortBy { case (n, bi, tok, _, _) => (-n, bi, tok) }
                  .take(width)
                  .map {
                    case (_, _, -1, _, b) => b // a kept completed beam
                    case (_, _, tok, raw, (g, _, sess, _)) =>
                      if (tok == eosId)
                        // complete: the session is never read again —
                        // skip the fork, keep the frozen raw score
                        (g :+ tok, raw, sess, true)
                      else {
                        val child = sess.fork()
                        child.append(tok)
                        (g :+ tok, raw, child, false)
                      }
                  }
                t += 1
              }
              Row.fromSeq(r.toSeq :+ beams.map(_._1.toSeq))
            }
          }
        } else {
          // no-cache batch path: every live beam of every row rides
          // ONE forwardTokensBatch per step
          // per row: ranked beams as (generated tokens, score)
          var beams: Array[Seq[(Vector[Int], Double)]] = prompts.map { p =>
            if (p == null) null else Seq((Vector.empty[Int], 0.0))
          }
          var t = 0
          while (t < steps) {
          // flatten (row, beamRank) -> sequence for ONE batch forward
          val idx = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
          val seqs = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
          beams.zipWithIndex.foreach { case (bms, ri) =>
            if (bms != null) bms.zipWithIndex.foreach { case ((g, _), bi) =>
              idx += ((ri, bi))
              seqs += (prompts(ri) ++ g)
            }
          }
          if (seqs.nonEmpty) {
            val out = m.forwardTokensBatch(seqs.toArray)
            val lpByKey = idx.zipWithIndex.map { case (k, i) =>
              k -> logProbs(out, i * vocab)
            }.toMap
            beams = beams.zipWithIndex.map { case (bms, ri) =>
              if (bms == null) null
              else {
                val cands = bms.zipWithIndex.flatMap { case ((g, s), bi) =>
                  val lp = lpByKey((ri, bi))
                  (0 until vocab).map(tok => (s + lp(tok), bi, tok, g))
                }
                // total order: score DESC, parent rank ASC, token ASC
                cands.sortBy { case (sc, bi, tok, _) => (-sc, bi, tok) }
                  .take(width)
                  .map { case (sc, _, tok, g) => (g :+ tok, sc) }
              }
            }
          }
            t += 1
          }
          rows.iterator.zipWithIndex.map { case (r, ri) =>
            if (beams(ri) == null) Row.fromSeq(r.toSeq :+ null)
            else Row.fromSeq(r.toSeq :+ beams(ri).map(_._1.toSeq))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * DIVERSE BEAM SEARCH (Vijayakumar et al. 2018 — HF
   * `num_beam_groups` + `diversity_penalty`, the
   * HammingDiversityLogitsProcessor): `groups` beam frontiers of
   * `width` each decode SEQUENTIALLY within a step; group g's
   * candidate log-softmax scores subtract `diversityPenalty ×
   * count(token among the tokens groups 0..g-1 SELECTED at this
   * step)` BEFORE ranking, and the penalized value accumulates into
   * the kept beam's running score (HF semantics — the processor
   * rewrites the scores the scorer accumulates, so a diverse pick
   * carries its penalty forever). Groups never see each other's
   * scores, only each other's CHOSEN tokens, so group 0 is
   * bit-identical to plain [[beamSearch]](width) at ANY penalty
   * (spec-pinned), and `diversityPenalty = 0` makes every group
   * identical to it.
   *
   * Determinism: the penalty is `dyadic λ × integer count` (exact
   * f64), ranking is the repo beam order (adjusted joint DESC,
   * parent rank ASC, token ASC).
   *
   * COMPOSES with [[beamSearch]]'s completed-beam machinery (round
   * 17, VERDICT r16 item 3 — HF ships group beam search with eos +
   * length penalty by default): within each group, a beam that picks
   * `eosId` FREEZES (its session is never read again, its penalized
   * running score is frozen) and thereafter competes for its group's
   * width slots as its own single candidate at `raw / len^alpha`
   * over its OWN length, while live expansions rank at
   * `(raw + adj) / (len+1)^alpha` — the GNMT rule q214 pins, group-
   * local. Frozen beams select no token, so they contribute NOTHING
   * to later groups' same-step diversity counts; a beam completing
   * THIS step counts its eos selection like any other pick. With
   * `lengthPenalty = 0 ∧ eosId = -1` every norm is the raw joint and
   * nothing freezes — bit-exact to the pre-knob behavior
   * (spec-pinned), and group 0 stays bit-identical to plain
   * [[beamSearch]] under the SAME knobs at any penalty.
   *
   * Scale shape: per-row KV sessions with `fork()` inside ONE
   * `mapPartitions` — groups×width sessions per row, O(L·d) per
   * step, no per-step plan growth.
   *
   * @return input columns + `outCol` = array of groups×width beams
   *         (group-major: g0's beams ranked, then g1's, ...), each an
   *         array<int> of generated tokens (a completed beam's array
   *         ends at its eos)
   */
  def beamSearchDiverse(
      df: DataFrame,
      inputCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      width: Int,
      groups: Int,
      diversityPenalty: Double,
      batchSize: Int = -1,
      lengthPenalty: Double = 0.0,
      eosId: Int = -1,
      watermarkDelta: Double = 0.0,
      watermarkGamma: (Int, Int) = (1, 2),
      lmWeight: Double = 0.0,
      lmCounts: Array[Array[Long]] = null): DataFrame = {
    require(steps >= 1 && width >= 1, "steps and width must be >= 1")
    require(groups >= 1, "groups must be >= 1")
    require(diversityPenalty >= 0.0, "diversityPenalty must be >= 0")
    require(lengthPenalty >= 0.0, "lengthPenalty must be >= 0")
    require(eosId < model.value.outDim, "eosId exceeds the vocabulary")
    // SHALLOW FUSION under diverse groups (the last cell of the
    // bias × decode-family matrix): the frozen bigram prior adds to
    // each live candidate's log-softmax ALONGSIDE the Hamming
    // penalty — both post-lse score adjustments on the same
    // accumulated value, `s0 + (lp − λdiv·cnt + λlm·ln p_LM)` — so
    // group 0 stays bit-identical to FUSED plain beamSearch and
    // lmWeight = 0 to the unfused diverse path (guarded; both
    // spec-pinned).
    require(lmWeight >= 0.0, "lmWeight must be >= 0")
    val vocabN = model.value.outDim
    require(lmWeight == 0.0 || (lmCounts != null &&
      lmCounts.length == vocabN && lmCounts.forall(_.length == vocabN)),
      "lmCounts must be vocab x vocab when lmWeight > 0")
    val bcLm: Broadcast[(Array[Array[Long]], Array[Long])] =
      if (lmWeight == 0.0) null
      else df.sparkSession.sparkContext.broadcast(
        (lmCounts, lmCounts.map(_.sum)))
    // the WATERMARK under diverse groups (round 18 — deployments
    // watermark whatever decode they run): each live beam's raw
    // logits gain +delta on the green set keyed by ITS OWN last
    // token BEFORE the per-group log-softmax (beamSearch's exact
    // logProbsBiased order); the Hamming diversity penalty then
    // subtracts from the BIASED log-softmax downstream, so group 0
    // stays bit-identical to watermarked plain beamSearch and
    // delta = 0 reduces bit-exactly to the unwatermarked path (the
    // guarded branch; both spec-pinned).
    require(watermarkDelta >= 0.0, "watermarkDelta must be >= 0")
    require(watermarkGamma._1 >= 1 && watermarkGamma._1 < watermarkGamma._2,
      "watermarkGamma must be a fraction num/den with 0 < num < den")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1, "beamSearchDiverse needs a token-input model")
    require(!model.value.isCross, "cross-attention model: use beamSearchPair")
    require(width <= model.value.outDim, "width exceeds the vocabulary")
    require(model.value.cacheable,
      "diverse beam search needs the KV-session path (cacheable model)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(ArrayType(IntegerType)), nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      val lm = if (bcLm == null) null else bcLm.value
      // generateGreedyFused's exact f64 prior term (0-guarded)
      def fused(prev: Int, tok: Int): Double =
        lmWeight * StrictMath.log(
          (lm._1(prev)(tok) + 1L).toDouble /
            (lm._2(prev) + vocab.toLong).toDouble)
      def logProbs(out: Array[Float]): Array[Double] = {
        var mx = Double.NegativeInfinity
        var j = 0
        while (j < vocab) {
          val v = out(j).toDouble
          if (v > mx) mx = v
          j += 1
        }
        var z = 0.0
        j = 0
        while (j < vocab) { z += math.exp(out(j).toDouble - mx); j += 1 }
        val lse = math.log(z) + mx
        Array.tabulate(vocab)(k => out(k).toDouble - lse)
      }
      // beamSearch's logProbsBiased verbatim: green logits (keyed on
      // the beam's last token) gain +delta BEFORE the log-softmax
      def logProbsBiased(out: Array[Float], prev: Int): Array[Double] = {
        val adj = Array.tabulate(vocab) { j =>
          if (Sampling.greenToken(prev, j, watermarkGamma._1, watermarkGamma._2))
            out(j).toDouble + watermarkDelta
          else out(j).toDouble
        }
        var mx = Double.NegativeInfinity
        var j = 0
        while (j < vocab) { if (adj(j) > mx) mx = adj(j); j += 1 }
        var z = 0.0
        j = 0
        while (j < vocab) { z += math.exp(adj(j) - mx); j += 1 }
        val lse = math.log(z) + mx
        Array.tabulate(vocab)(k => adj(k) - lse)
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq :+ null)
          else {
            // per group: ranked beams (generated, running score,
            // session, done) — done beams' sessions are never read
            val frontiers = Array.fill(groups)(
              Seq((Vector.empty[Int], 0.0, m.decodeSession(p), false)))
            var t = 0
            while (t < steps) {
              // tokens selected at THIS step by earlier groups
              // (frozen keeps select nothing)
              val stepCounts = new Array[Int](vocab)
              var g = 0
              while (g < groups) {
                // candidates = (norm, parent rank, token, raw, parent):
                // the beamSearch candidate shape — a completed beam is
                // its own single candidate (token -1, frozen raw over
                // its OWN length) competing for a width slot
                val cands = frontiers(g).zipWithIndex.flatMap {
                  case ((gen, s0, sess, true), bi) =>
                    Seq((s0 / StrictMath.pow(gen.length.toDouble, lengthPenalty),
                      bi, -1, s0, (gen, s0, sess, true)))
                  case ((gen, s0, sess, false), bi) =>
                    val lp =
                      if (watermarkDelta == 0.0) logProbs(sess.logits())
                      else logProbsBiased(sess.logits(),
                        if (gen.nonEmpty) gen.last else p.last)
                    val pen =
                      StrictMath.pow((gen.length + 1).toDouble, lengthPenalty)
                    (0 until vocab).map { tok =>
                      // f64 order pinned: (s0 + (lp − λ·cnt)) + fused
                      // — the pre-knob accumulation plus a TRAILING
                      // fused term, so q236 stays bit-exact at
                      // lmWeight = 0 (guarded) AND group 0 (cnt = 0,
                      // lp − 0.0 ≡ lp) reproduces fused plain
                      // beamSearch's (s0 + lp) + fused association
                      // bit-for-bit
                      val adj = lp(tok) - diversityPenalty * stepCounts(tok)
                      val raw0 = s0 + adj
                      val raw =
                        if (lmWeight == 0.0) raw0
                        else raw0 +
                          fused(if (gen.nonEmpty) gen.last else p.last, tok)
                      (raw / pen, bi, tok, raw, (gen, s0, sess, false))
                    }
                }
                frontiers(g) = cands
                  .sortBy { case (norm, bi, tok, _, _) => (-norm, bi, tok) }
                  .take(width)
                  .map {
                    case (_, _, -1, _, b) => b // a kept completed beam
                    case (_, _, tok, raw, (gen, _, sess, _)) =>
                      if (tok == eosId) {
                        // complete: freeze the penalized raw, count
                        // the eos selection below, never fork
                        stepCounts(tok) += 1
                        (gen :+ tok, raw, sess, true)
                      } else {
                        stepCounts(tok) += 1
                        val child = sess.fork()
                        child.append(tok)
                        (gen :+ tok, raw, child, false)
                      }
                  }
                g += 1
              }
              t += 1
            }
            Row.fromSeq(r.toSeq :+
              frontiers.toSeq.flatMap(_.map(_._1.toSeq)))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * STOCHASTIC speculative sampling — the actual
   * Leviathan/Chen 2023 acceptance rule (q212's greedy speculative
   * decode verifies argmax equivalence; THIS is the
   * distribution-preserving sampled form): the draft model SAMPLES a
   * token `x ~ q`, the target accepts it with probability
   * `min(1, p(x)/q(x))`, and on rejection resamples from the
   * normalized residual `max(0, p − q)` — the composition provably
   * equal in distribution to sampling from the target alone.
   *
   * Determinism discipline: p and q are full-vocab softmaxes
   * quantized to the 6dp grid; the three random choices are
   * independent md5 draws (`"<id>:spec:d1"` the draft pick,
   * `":spec:a1"` the acceptance, `":spec:r1"` the residual pick) on
   * the 1e-6 grid; the acceptance ratio re-quantizes to 6dp before
   * the strict `u < r` compare; residual masses are exact grid
   * differences and the resample walks (r DESC, tid) with the
   * engine's order-defined renormalized cumulative. An all-zero
   * residual (p == q on the grid) keeps the draft token.
   *
   * Scale shape: two KV sessions per row (draft + target prefix),
   * one step each, inside ONE `mapPartitions`.
   *
   * @return input columns + `draft_tok` int, `accepted` boolean,
   *         `final_tok` int (null prompt → all null)
   */
  def speculativeSampled(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      batchSize: Int = -1): DataFrame = {
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "speculativeSampled needs token-input models")
    require(!target.value.isCross && !draft.value.isCross,
      "cross models: use the pair speculative path")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "speculative sampling needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("draft_tok", IntegerType, nullable = true),
      StructField("accepted", BooleanType, nullable = true),
      StructField("final_tok", IntegerType, nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def q6(x: Double): Double = Spec.q6(x)
      def draw(id: Long, salt: String): Double = Spec.draw(id, salt)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      // the engine's order-defined renormalized-cumulative pick over
      // (mass DESC, tid ASC) — exactly the q203 nucleus walk at
      // topP = 1 (so every positive-mass candidate is kept)
      def pick(mass: Array[Double], u: Double): Int = Spec.pick(mass, u)
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx) || r.isNullAt(idIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            val id = r.getAs[Number](idIdx).longValue()
            val qp = probs6(dm.decodeSession(p).logits())
            val pp = probs6(tm.decodeSession(p).logits())
            val dx = pick(qp, draw(id, "d1"))
            val r6 = q6(math.min(1.0, pp(dx) / qp(dx)))
            val accepted = draw(id, "a1") < r6
            val fx =
              if (accepted) dx
              else {
                val resid = Array.tabulate(vocab)(j =>
                  math.max(0.0, pp(j) - qp(j))) // exact grid differences
                if (resid.forall(_ == 0.0)) dx // p == q on the grid
                else pick(resid, draw(id, "r1"))
              }
            Row.fromSeq(r.toSeq ++ Seq(dx, accepted, fx))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * MULTI-TOKEN stochastic speculative sampling (the full
   * Leviathan 2023 / Chen et al. 2023 serving recipe, gamma >= 1 —
   * [[speculativeSampled]] is its gamma = 1 head): per cycle the
   * draft model autoregressively SAMPLES `gamma` tokens
   * `x_1..x_g ~ q`, the target evaluates all `gamma + 1` prefix
   * distributions (one KV-session append per draft token — the
   * batched-verification position walk), and the prefix-acceptance
   * rule walks the drafts in order: accept `x_i` with probability
   * `min(1, p_i(x_i)/q_i(x_i))`; at the FIRST rejection resample
   * from the normalized residual `max(0, p_i − q_i)` and STOP; if
   * every draft is accepted, emit ONE bonus token sampled from the
   * target's distribution at the fully-drafted prefix. The emitted
   * `n_accepted (+1)` tokens are provably distributed exactly as
   * `n_accepted + 1` tokens sampled from the target alone — the
   * speedup is `n_accepted + 1` target-distributed tokens for one
   * drafting pass + one (sessionized) verification pass.
   *
   * Determinism discipline is [[speculativeSampled]]'s verbatim: all
   * distributions are 6dp-quantized full-vocab softmaxes; draws are
   * independent md5 draws on the 1e-6 grid with POSITION-INDEXED
   * salts — draft pick i = `"d<i>"`, acceptance i = `"a<i>"`,
   * residual i = `"r<i>"`, bonus = `"b1"` — so `gamma = 1` replays
   * q247's exact draws (spec-pinned: same draft token, same
   * acceptance, same correction). An all-zero residual (p == q on
   * the grid) keeps the rejected draft token. An identity draft
   * (draft eq target) accepts every position by construction
   * (ratio quantizes to 1, draws are < 1) — spec-pinned.
   *
   * Scale shape: two KV sessions per row (draft + target), gamma
   * appends each, inside ONE `mapPartitions` — O(gamma·L·d) per row,
   * no shuffle at any corpus size.
   *
   * @return input columns + `draft_toks` array<int> (the gamma
   *         drafts), `n_accepted` int, `out_toks` array<int> (the
   *         accepted prefix + correction-or-bonus; length
   *         `n_accepted + 1`); null prompt/id → all null
   */
  def speculativeSampledGamma(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      gamma: Int,
      batchSize: Int = -1,
      watermarkDelta: Double = 0.0,
      watermarkGamma: (Int, Int) = (1, 2)): DataFrame = {
    require(gamma >= 1, "gamma must be >= 1")
    // WATERMARK × SPECULATIVE (Kirchenbauer 2023 × Leviathan 2023):
    // the green-list bias +delta lands on the TARGET's raw logits
    // before each of its gamma+1 prefix softmaxes (green membership
    // keyed on the prefix's last token — prompt tail for p_1, draft
    // i for p_{i+1}; q239's deployment order). The acceptance/
    // residual rule preserves WHATEVER target distribution it is
    // given, so the emitted tokens are provably watermarked-target
    // distributed while the (watermark-oblivious) draft stays
    // unbiased — exactly the deployment where a serving stack both
    // watermarks and draft-accelerates. delta = 0 keeps the
    // unwatermarked code path bit-exactly (guarded branch;
    // spec-pinned).
    require(watermarkDelta >= 0.0, "watermarkDelta must be >= 0")
    require(watermarkGamma._1 >= 1 && watermarkGamma._1 < watermarkGamma._2,
      "watermarkGamma must be a fraction num/den with 0 < num < den")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "speculativeSampledGamma needs token-input models")
    require(!target.value.isCross && !draft.value.isCross,
      "cross models: use the pair speculative path")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "speculative sampling needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("draft_toks", ArrayType(IntegerType), nullable = true),
      StructField("n_accepted", IntegerType, nullable = true),
      StructField("out_toks", ArrayType(IntegerType), nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    val (wmNum, wmDen) = watermarkGamma
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def q6(x: Double): Double = Spec.q6(x)
      def draw(id: Long, salt: String): Double = Spec.draw(id, salt)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def pick(mass: Array[Double], u: Double): Int = Spec.pick(mass, u)
      // the target's grid distribution under the green bias: raw
      // logits + delta on the green set keyed on `prev`, THEN the
      // softmax (the lse shifts with the bias — q239's greedy order);
      // delta = 0 routes through the shared probs6 (bit-identical)
      def probs6W(lg: Array[Float], prev: Int): Array[Double] =
        if (watermarkDelta == 0.0) probs6(lg)
        else {
          val bl = new Array[Double](vocab)
          var mx = Double.NegativeInfinity
          var j = 0
          while (j < vocab) {
            val v = lg(j).toDouble +
              (if (Sampling.greenToken(prev, j, wmNum, wmDen)) watermarkDelta
               else 0.0)
            bl(j) = v
            if (v > mx) mx = v
            j += 1
          }
          var z = 0.0
          j = 0
          while (j < vocab) { z += math.exp(bl(j) - mx); j += 1 }
          Array.tabulate(vocab)(k => q6(math.exp(bl(k) - mx) / z))
        }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx) || r.isNullAt(idIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            val id = r.getAs[Number](idIdx).longValue()
            val sd = dm.decodeSession(p)
            val st = tm.decodeSession(p)
            val drafts = new Array[Int](gamma)
            val qm = new Array[Array[Double]](gamma)
            var i = 0
            while (i < gamma) {
              qm(i) = probs6(sd.logits())
              drafts(i) = pick(qm(i), draw(id, s"d${i + 1}"))
              sd.append(drafts(i))
              i += 1
            }
            // target prefix distributions p_1..p_{gamma+1}: one
            // session, one append per draft token; the watermark
            // bias keys on each prefix's LAST token
            val pm = new Array[Array[Double]](gamma + 1)
            pm(0) = probs6W(st.logits(), p(p.length - 1))
            i = 0
            while (i < gamma) {
              st.append(drafts(i))
              pm(i + 1) = probs6W(st.logits(), drafts(i))
              i += 1
            }
            var n = 0
            var rejectedAt = -1
            while (n < gamma && rejectedAt < 0) {
              val x = drafts(n)
              val r6 = q6(math.min(1.0, pm(n)(x) / qm(n)(x)))
              if (draw(id, s"a${n + 1}") < r6) n += 1
              else rejectedAt = n
            }
            val out: Seq[Int] =
              if (rejectedAt < 0)
                drafts.toSeq :+ pick(pm(gamma), draw(id, "b1"))
              else {
                val k = rejectedAt
                val resid = Array.tabulate(vocab)(j =>
                  math.max(0.0, pm(k)(j) - qm(k)(j))) // exact grid differences
                val corr =
                  if (resid.forall(_ == 0.0)) drafts(k) // p == q on the grid
                  else pick(resid, draw(id, s"r${k + 1}"))
                drafts.take(k).toSeq :+ corr
              }
            Row.fromSeq(r.toSeq ++ Seq(drafts.toSeq, n, out))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * The speculative SERVING LOOP — [[speculativeSampledGamma]] cycled
   * until `maxNewTokens` tokens are emitted (then truncated), the
   * shape a draft-accelerated inference server actually runs: each
   * cycle drafts gamma tokens, verifies them against the target's
   * prefix distributions, emits accepted run + correction-or-bonus,
   * and ROLLS BACK both KV sessions to the emitted prefix before the
   * next cycle. Rollback here is the fork discipline — the
   * accepted-prefix sessions are never polluted by rejected drafts:
   * each cycle VERIFIES on forks (`st0.fork()` / `sd0.fork()`), and
   * the new accepted-prefix sessions are fresh forks of the old ones
   * with only the EMITTED tokens appended (O(L) pointer copy + O(E)
   * appends — no prompt replay, no un-append needed).
   *
   * Draw discipline: salts are GLOBAL position indices — cycle c
   * draft i uses `"d<(c−1)·gamma + i>"` (likewise a/r), bonus
   * `"b<c>"` — so cycle 1 replays [[speculativeSampledGamma]]'s
   * exact draws (spec-pinned: the loop's first cycle IS q249), and
   * a row's draws are independent of partition layout and of OTHER
   * rows, like every sampler here. A cycle always runs to
   * completion (full gamma-draft + walk) even when it overshoots
   * `maxNewTokens` — the server truncates output, not the cycle —
   * so emitted prefixes are cycle-deterministic.
   *
   * @return input columns + `out_toks` array<int> (exactly
   *         maxNewTokens tokens), `n_cycles` int, `n_acc_total` int
   *         (accepted drafts across all cycles — the serving
   *         acceptance-rate telemetry; CYCLE-LEVEL, i.e. the final
   *         cycle's accepted run counts in full even when the emitted
   *         output truncates to maxNewTokens, so gamma = 2 with
   *         maxNewTokens = 1 and an all-accepted first cycle reports
   *         n_acc_total = 2 for 1 emitted token — the dashboard
   *         metric a server tracks is per-VERIFICATION-PASS yield,
   *         which truncation does not refund); null prompt/id → all
   *         null
   */
  def speculativeSampledLoop(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      gamma: Int,
      maxNewTokens: Int,
      batchSize: Int = -1,
      watermarkDelta: Double = 0.0,
      watermarkGamma: (Int, Int) = (1, 2),
      nSink: Int = -1,
      nWindow: Int = -1,
      relPos: Boolean = false): DataFrame = {
    require(gamma >= 1, "gamma must be >= 1")
    require(maxNewTokens >= 1, "maxNewTokens must be >= 1")
    // relPos (q296): the bounded sessions re-index their cache slots
    // on eviction ([[TorchScriptModel.decodeSessionRelPos]]) — the
    // serving loop runs past the models' bias-table length with a
    // fixed-size table; scope-checked at session open
    require(!relPos || nWindow > 0,
      "relPos is a dial on the bounded-KV sessions (needs nWindow >= 1)")
    // WATERMARK × SPECULATIVE SERVING (q285): the green bias rides the
    // TARGET's prefix softmaxes across EVERY cycle — the q281 cell
    // cycled, so a serving stack watermarks AND draft-accelerates AND
    // rolls its KV forward. delta = 0 keeps the unwatermarked path
    // bit-exactly (guarded; spec-pinned), cycle 1 replays the q281
    // cell's draws.
    require(watermarkDelta >= 0.0, "watermarkDelta must be >= 0")
    require(watermarkGamma._1 >= 1 && watermarkGamma._1 < watermarkGamma._2,
      "watermarkGamma must be a fraction num/den with 0 < num < den")
    // BOUNDED-KV SERVING (q284, the StreamingLLM deployment): both
    // models' sessions evict to nSink sinks + an nWindow sliding
    // window ([[TorchScriptModel.decodeSessionWindowed]]) — forks
    // inherit the knobs, so verification forks and roll-forwards stay
    // O(nSink + nWindow) per session. nWindow <= 0 keeps the
    // unbounded sessions (identical arithmetic; spec-pinned).
    val windowed = nWindow > 0
    require(!windowed || nSink >= 0,
      "a bounded-KV loop needs nSink >= 0 alongside nWindow >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "speculativeSampledLoop needs token-input models")
    require(!target.value.isCross && !draft.value.isCross,
      "cross models: use the pair speculative path")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "speculative sampling needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("out_toks", ArrayType(IntegerType), nullable = true),
      StructField("n_cycles", IntegerType, nullable = true),
      StructField("n_acc_total", IntegerType, nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    val (wmNum, wmDen) = watermarkGamma
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def q6(x: Double): Double = Spec.q6(x)
      def draw(id: Long, salt: String): Double = Spec.draw(id, salt)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def pick(mass: Array[Double], u: Double): Int = Spec.pick(mass, u)
      // the q281 biased-target softmax (see speculativeSampledGamma)
      def probs6W(lg: Array[Float], prev: Int): Array[Double] =
        if (watermarkDelta == 0.0) probs6(lg)
        else {
          val bl = new Array[Double](vocab)
          var mx = Double.NegativeInfinity
          var j = 0
          while (j < vocab) {
            val v = lg(j).toDouble +
              (if (Sampling.greenToken(prev, j, wmNum, wmDen)) watermarkDelta
               else 0.0)
            bl(j) = v
            if (v > mx) mx = v
            j += 1
          }
          var z = 0.0
          j = 0
          while (j < vocab) { z += math.exp(bl(j) - mx); j += 1 }
          Array.tabulate(vocab)(k => q6(math.exp(bl(k) - mx) / z))
        }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx) || r.isNullAt(idIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            val id = r.getAs[Number](idIdx).longValue()
            // target/draft @ accepted prefix (bounded caches when the
            // serving loop runs at a KV budget)
            var st0 = if (relPos) tm.decodeSessionRelPos(p, nSink, nWindow)
                      else if (windowed) tm.decodeSessionWindowed(p, nSink, nWindow)
                      else tm.decodeSession(p)
            var sd0 = if (relPos) dm.decodeSessionRelPos(p, nSink, nWindow)
                      else if (windowed) dm.decodeSessionWindowed(p, nSink, nWindow)
                      else dm.decodeSession(p)
            var lastTok = p(p.length - 1) // the green key for p_1
            val emitted = scala.collection.mutable.ArrayBuffer.empty[Int]
            var cycles = 0
            var accTotal = 0
            while (emitted.length < maxNewTokens) {
              cycles += 1
              val base = (cycles - 1) * gamma
              val sdV = sd0.fork()
              val drafts = new Array[Int](gamma)
              val qm = new Array[Array[Double]](gamma)
              var i = 0
              while (i < gamma) {
                qm(i) = probs6(sdV.logits())
                drafts(i) = pick(qm(i), draw(id, s"d${base + i + 1}"))
                sdV.append(drafts(i))
                i += 1
              }
              val stV = st0.fork()
              val pm = new Array[Array[Double]](gamma + 1)
              pm(0) = probs6W(stV.logits(), lastTok)
              i = 0
              while (i < gamma) {
                stV.append(drafts(i))
                pm(i + 1) = probs6W(stV.logits(), drafts(i))
                i += 1
              }
              var n = 0
              var rejectedAt = -1
              while (n < gamma && rejectedAt < 0) {
                val x = drafts(n)
                val r6 = q6(math.min(1.0, pm(n)(x) / qm(n)(x)))
                if (draw(id, s"a${base + n + 1}") < r6) n += 1
                else rejectedAt = n
              }
              accTotal += n
              val cycleOut: Seq[Int] =
                if (rejectedAt < 0)
                  drafts.toSeq :+ pick(pm(gamma), draw(id, s"b$cycles"))
                else {
                  val k = rejectedAt
                  val resid = Array.tabulate(vocab)(j =>
                    math.max(0.0, pm(k)(j) - qm(k)(j)))
                  val corr =
                    if (resid.forall(_ == 0.0)) drafts(k)
                    else pick(resid, draw(id, s"r${base + k + 1}"))
                  drafts.take(k).toSeq :+ corr
                }
              emitted ++= cycleOut
              lastTok = cycleOut.last
              if (emitted.length < maxNewTokens) {
                // roll forward the accepted-prefix sessions: fresh
                // forks + the emitted tokens only (rejected drafts
                // never touch them)
                val st1 = st0.fork(); cycleOut.foreach(st1.append); st0 = st1
                val sd1 = sd0.fork(); cycleOut.foreach(sd1.append); sd0 = sd1
              }
            }
            Row.fromSeq(r.toSeq ++
              Seq(emitted.take(maxNewTokens).toSeq, cycles, accTotal))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * STOCHASTIC speculative sampling for CROSS (encoder-decoder)
   * models — [[speculativeSampled]]'s distribution-preserving rule
   * with both sessions opened against the row's fixed source
   * encoding (q212 is the greedy/argmax cross cell; this is the
   * sampled one): the int8 draft SAMPLES `x ~ q(· | dec, src)`, the
   * target accepts with probability `min(1, p(x)/q(x))`, a rejection
   * resamples from the normalized residual. Identical salts
   * (`d1`/`a1`/`r1`), identical 6dp quantization discipline,
   * identical pick walk — only the forward is cross-attentive (the
   * encoder leg runs once per session, cross k/v project once).
   *
   * @return input columns + `draft_tok` int, `accepted` boolean,
   *         `final_tok` int (null/empty decoder prompt, source, or
   *         id → all null)
   */
  def speculativeSampledPair(
      df: DataFrame,
      idCol: String,
      decCol: String,
      encCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      batchSize: Int = -1): DataFrame = {
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "speculativeSampledPair needs token-input models")
    require(target.value.isCross && draft.value.isCross,
      "single-stream models: use speculativeSampled")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "speculative sampling needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df)
      .withColumn(decCol, col(decCol).cast(ArrayType(IntegerType)))
      .withColumn(encCol, col(encCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("draft_tok", IntegerType, nullable = true),
      StructField("accepted", BooleanType, nullable = true),
      StructField("final_tok", IntegerType, nullable = true)))
    val dIdx = withInts.schema.fieldIndex(decCol)
    val eIdx = withInts.schema.fieldIndex(encCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def q6(x: Double): Double = Spec.q6(x)
      def draw(id: Long, salt: String): Double = Spec.draw(id, salt)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def pick(mass: Array[Double], u: Double): Int = Spec.pick(mass, u)
      def ints(r: Row, idx: Int): Array[Int] =
        if (r.isNullAt(idx)) null
        else {
          val xs = r.getSeq[Any](idx)
          val a = new Array[Int](xs.length)
          var j = 0
          var ok = true
          while (ok && j < a.length) {
            xs(j) match {
              case null => ok = false
              case f: java.lang.Number => a(j) = f.intValue(); j += 1
            }
          }
          if (ok && a.nonEmpty) a else null
        }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p = ints(r, dIdx)
          val src = ints(r, eIdx)
          if (p == null || src == null || r.isNullAt(idIdx))
            Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            val id = r.getAs[Number](idIdx).longValue()
            val qp = probs6(dm.decodeSession(p, src).logits())
            val pp = probs6(tm.decodeSession(p, src).logits())
            val dx = pick(qp, draw(id, "d1"))
            val r6 = q6(math.min(1.0, pp(dx) / qp(dx)))
            val accepted = draw(id, "a1") < r6
            val fx =
              if (accepted) dx
              else {
                val resid = Array.tabulate(vocab)(j =>
                  math.max(0.0, pp(j) - qp(j)))
                if (resid.forall(_ == 0.0)) dx
                else pick(resid, draw(id, "r1"))
              }
            Row.fromSeq(r.toSeq ++ Seq(dx, accepted, fx))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * MULTI-TOKEN stochastic speculative sampling for CROSS models —
   * [[speculativeSampledGamma]]'s prefix-acceptance cycle with both
   * sessions opened against the row's fixed source encoding
   * ([[speculativeSampledPair]] is its gamma = 1 head; same
   * position-indexed salts, so gamma = 1 replays it bit-exactly —
   * spec-pinned). The draft autoregressively samples gamma decoder
   * tokens, the target verifies all gamma + 1 prefix positions
   * through one cross KV session (encoder leg runs once), and the
   * Leviathan/Chen rule emits accepted run + residual correction or
   * the all-accepted bonus.
   *
   * @return input columns + `draft_toks` array<int>, `n_accepted`
   *         int, `out_toks` array<int> (length n_accepted + 1);
   *         null/empty decoder prompt, source, or id → all null
   */
  def speculativeSampledPairGamma(
      df: DataFrame,
      idCol: String,
      decCol: String,
      encCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      gamma: Int,
      batchSize: Int = -1): DataFrame = {
    require(gamma >= 1, "gamma must be >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "speculativeSampledPairGamma needs token-input models")
    require(target.value.isCross && draft.value.isCross,
      "single-stream models: use speculativeSampledGamma")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "speculative sampling needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df)
      .withColumn(decCol, col(decCol).cast(ArrayType(IntegerType)))
      .withColumn(encCol, col(encCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("draft_toks", ArrayType(IntegerType), nullable = true),
      StructField("n_accepted", IntegerType, nullable = true),
      StructField("out_toks", ArrayType(IntegerType), nullable = true)))
    val dIdx = withInts.schema.fieldIndex(decCol)
    val eIdx = withInts.schema.fieldIndex(encCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def q6(x: Double): Double = Spec.q6(x)
      def draw(id: Long, salt: String): Double = Spec.draw(id, salt)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def pick(mass: Array[Double], u: Double): Int = Spec.pick(mass, u)
      def ints(r: Row, idx: Int): Array[Int] =
        if (r.isNullAt(idx)) null
        else {
          val xs = r.getSeq[Any](idx)
          val a = new Array[Int](xs.length)
          var j = 0
          var ok = true
          while (ok && j < a.length) {
            xs(j) match {
              case null => ok = false
              case f: java.lang.Number => a(j) = f.intValue(); j += 1
            }
          }
          if (ok && a.nonEmpty) a else null
        }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p = ints(r, dIdx)
          val src = ints(r, eIdx)
          if (p == null || src == null || r.isNullAt(idIdx))
            Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            val id = r.getAs[Number](idIdx).longValue()
            val sd = dm.decodeSession(p, src)
            val st = tm.decodeSession(p, src)
            val drafts = new Array[Int](gamma)
            val qm = new Array[Array[Double]](gamma)
            var i = 0
            while (i < gamma) {
              qm(i) = probs6(sd.logits())
              drafts(i) = pick(qm(i), draw(id, s"d${i + 1}"))
              sd.append(drafts(i))
              i += 1
            }
            val pm = new Array[Array[Double]](gamma + 1)
            pm(0) = probs6(st.logits())
            i = 0
            while (i < gamma) {
              st.append(drafts(i))
              pm(i + 1) = probs6(st.logits())
              i += 1
            }
            var n = 0
            var rejectedAt = -1
            while (n < gamma && rejectedAt < 0) {
              val x = drafts(n)
              val r6 = q6(math.min(1.0, pm(n)(x) / qm(n)(x)))
              if (draw(id, s"a${n + 1}") < r6) n += 1
              else rejectedAt = n
            }
            val out: Seq[Int] =
              if (rejectedAt < 0)
                drafts.toSeq :+ pick(pm(gamma), draw(id, "b1"))
              else {
                val k = rejectedAt
                val resid = Array.tabulate(vocab)(j =>
                  math.max(0.0, pm(k)(j) - qm(k)(j)))
                val corr =
                  if (resid.forall(_ == 0.0)) drafts(k)
                  else pick(resid, draw(id, s"r${k + 1}"))
                drafts.take(k).toSeq :+ corr
              }
            Row.fromSeq(r.toSeq ++ Seq(drafts.toSeq, n, out))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * The CROSS-PAIR speculative SERVING LOOP —
   * [[speculativeSampledPairGamma]] cycled until `maxNewTokens`
   * decoder tokens are emitted (then truncated), closing the pair
   * side of the serving matrix the single-stream side has had since
   * [[speculativeSampledLoop]] (q254): each cycle drafts gamma
   * decoder tokens against the row's FIXED source encoding, verifies
   * them through the target's cross KV session, emits accepted run +
   * correction-or-bonus, and rolls both sessions forward by the
   * emitted tokens only. Rollback is the fork discipline verbatim —
   * verification runs on forks, the accepted-prefix sessions are
   * fresh forks + emitted appends (O(L) pointer copy; the
   * once-computed encoder k/v projections are SHARED by every fork,
   * so no cycle ever re-encodes the source). Draw discipline: global
   * position-indexed salts (`d/a/r<(c−1)·gamma+i>`, bonus `b<c>`), so
   * cycle 1 replays [[speculativeSampledPairGamma]] bit-exactly
   * (spec-pinned), and cycles run to completion (cycle-level
   * `n_acc_total`, the [[speculativeSampledLoop]] convention).
   *
   * @return input columns + `out_toks` array<int> (exactly
   *         maxNewTokens tokens), `n_cycles` int, `n_acc_total` int;
   *         null/empty decoder prompt, source, or id → all null
   */
  def speculativeSampledPairLoop(
      df: DataFrame,
      idCol: String,
      decCol: String,
      encCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      gamma: Int,
      maxNewTokens: Int,
      batchSize: Int = -1,
      nSink: Int = -1,
      nWindow: Int = -1): DataFrame = {
    require(gamma >= 1, "gamma must be >= 1")
    require(maxNewTokens >= 1, "maxNewTokens must be >= 1")
    // BOUNDED-KV pair serving (q293): the decoder-side causal caches
    // of BOTH models evict to nSink sinks + an nWindow window
    // (decodeSessionWindowed's cross leg — the once-computed encoder
    // k/v are immutable and never evict); forks inherit the knobs.
    // nWindow <= 0 keeps the unbounded sessions (identical
    // arithmetic; spec-pinned).
    val windowed = nWindow > 0
    require(!windowed || nSink >= 0,
      "a bounded-KV loop needs nSink >= 0 alongside nWindow >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "speculativeSampledPairLoop needs token-input models")
    require(target.value.isCross && draft.value.isCross,
      "single-stream models: use speculativeSampledLoop")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "speculative sampling needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df)
      .withColumn(decCol, col(decCol).cast(ArrayType(IntegerType)))
      .withColumn(encCol, col(encCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("out_toks", ArrayType(IntegerType), nullable = true),
      StructField("n_cycles", IntegerType, nullable = true),
      StructField("n_acc_total", IntegerType, nullable = true)))
    val dIdx = withInts.schema.fieldIndex(decCol)
    val eIdx = withInts.schema.fieldIndex(encCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def q6(x: Double): Double = Spec.q6(x)
      def draw(id: Long, salt: String): Double = Spec.draw(id, salt)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def pick(mass: Array[Double], u: Double): Int = Spec.pick(mass, u)
      def ints(r: Row, idx: Int): Array[Int] =
        if (r.isNullAt(idx)) null
        else {
          val xs = r.getSeq[Any](idx)
          val a = new Array[Int](xs.length)
          var j = 0
          var ok = true
          while (ok && j < a.length) {
            xs(j) match {
              case null => ok = false
              case f: java.lang.Number => a(j) = f.intValue(); j += 1
            }
          }
          if (ok && a.nonEmpty) a else null
        }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p = ints(r, dIdx)
          val src = ints(r, eIdx)
          if (p == null || src == null || r.isNullAt(idIdx))
            Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            val id = r.getAs[Number](idIdx).longValue()
            // target/draft @ accepted prefix (decoder caches bounded
            // when the loop runs at a KV budget)
            var st0 = if (windowed)
                tm.decodeSessionWindowed(p, nSink, nWindow, src)
              else tm.decodeSession(p, src)
            var sd0 = if (windowed)
                dm.decodeSessionWindowed(p, nSink, nWindow, src)
              else dm.decodeSession(p, src)
            val emitted = scala.collection.mutable.ArrayBuffer.empty[Int]
            var cycles = 0
            var accTotal = 0
            while (emitted.length < maxNewTokens) {
              cycles += 1
              val base = (cycles - 1) * gamma
              val sdV = sd0.fork()
              val drafts = new Array[Int](gamma)
              val qm = new Array[Array[Double]](gamma)
              var i = 0
              while (i < gamma) {
                qm(i) = probs6(sdV.logits())
                drafts(i) = pick(qm(i), draw(id, s"d${base + i + 1}"))
                sdV.append(drafts(i))
                i += 1
              }
              val stV = st0.fork()
              val pm = new Array[Array[Double]](gamma + 1)
              pm(0) = probs6(stV.logits())
              i = 0
              while (i < gamma) {
                stV.append(drafts(i))
                pm(i + 1) = probs6(stV.logits())
                i += 1
              }
              var n = 0
              var rejectedAt = -1
              while (n < gamma && rejectedAt < 0) {
                val x = drafts(n)
                val r6 = q6(math.min(1.0, pm(n)(x) / qm(n)(x)))
                if (draw(id, s"a${base + n + 1}") < r6) n += 1
                else rejectedAt = n
              }
              accTotal += n
              val cycleOut: Seq[Int] =
                if (rejectedAt < 0)
                  drafts.toSeq :+ pick(pm(gamma), draw(id, s"b$cycles"))
                else {
                  val k = rejectedAt
                  val resid = Array.tabulate(vocab)(j =>
                    math.max(0.0, pm(k)(j) - qm(k)(j)))
                  val corr =
                    if (resid.forall(_ == 0.0)) drafts(k)
                    else pick(resid, draw(id, s"r${base + k + 1}"))
                  drafts.take(k).toSeq :+ corr
                }
              emitted ++= cycleOut
              if (emitted.length < maxNewTokens) {
                val st1 = st0.fork(); cycleOut.foreach(st1.append); st0 = st1
                val sd1 = sd0.fork(); cycleOut.foreach(sd1.append); sd0 = sd1
              }
            }
            Row.fromSeq(r.toSeq ++
              Seq(emitted.take(maxNewTokens).toSeq, cycles, accTotal))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * CONTRASTIVE DECODING (Li et al. 2023 — distinct from contrastive
   * SEARCH): each step picks, among the EXPERT's plausible candidates
   * (`p_e(j) >= alpha · max p_e` — the adaptive plausibility head),
   * the token maximizing `log p_expert − log p_amateur` — amplifying
   * what the strong model knows and the weak one doesn't, the
   * factual-decoding recipe. The amateur here is typically the int8/
   * int4-quantized expert (the same weak-model role it plays in
   * speculative decoding).
   *
   * Determinism discipline: the head floor is `dyadic alpha × 6dp
   * mass` (exact on the grid — the min-p compare); both log-softmaxes
   * quantize to 6dp before the difference, the pick ranks
   * (score DESC, tid) with a spec-pinned gap floor. The chosen token
   * appends to BOTH models' sessions.
   *
   * @return input columns + `outCol` = array<int> generated tokens
   */
  def generateContrastiveDecoding(
      df: DataFrame,
      inputCol: String,
      outCol: String,
      expert: Broadcast[TorchScriptModel],
      amateur: Broadcast[TorchScriptModel],
      steps: Int,
      plausibilityAlpha: Double,
      batchSize: Int = -1): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    require(plausibilityAlpha > 0.0 && plausibilityAlpha <= 1.0,
      "plausibilityAlpha must be in (0, 1]")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(expert.value.inDim == -1 && amateur.value.inDim == -1,
      "contrastive decoding needs token-input models")
    require(!expert.value.isCross && !amateur.value.isCross,
      "cross models not supported here")
    require(expert.value.outDim == amateur.value.outDim,
      "expert and amateur must share the vocabulary")
    require(expert.value.cacheable && amateur.value.cacheable,
      "contrastive decoding needs the KV-session path")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(IntegerType), nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val em = expert.value
      val am = amateur.value
      val vocab = em.outDim
      def q6(x: Double): Double =
        BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      // (p6 masses, 6dp log-probs) from one logits read
      def dists(lg: Array[Float]): (Array[Double], Array[Double]) = {
        var mx = Double.NegativeInfinity
        var j = 0
        while (j < vocab) {
          val v = lg(j).toDouble
          if (v > mx) mx = v
          j += 1
        }
        var z = 0.0
        j = 0
        while (j < vocab) { z += math.exp(lg(j).toDouble - mx); j += 1 }
        val lse = math.log(z) + mx
        (Array.tabulate(vocab)(k => q6(math.exp(lg(k).toDouble - mx) / z)),
          Array.tabulate(vocab)(k => q6(lg(k).toDouble - lse)))
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq :+ null)
          else {
            val se = em.decodeSession(p)
            val sa = am.decodeSession(p)
            val gen = scala.collection.mutable.ArrayBuffer.empty[Int]
            var t = 0
            while (t < steps) {
              val (pe, le) = dists(se.logits())
              val (_, la) = dists(sa.logits())
              val floor = plausibilityAlpha * pe.max // dyadic × grid: exact
              val head = (0 until vocab).filter(pe(_) >= floor)
              val tok = head
                .map(j => (le(j) - la(j), j))
                .minBy { case (s0, j) => (-s0, j) }._2
              gen += tok
              se.append(tok)
              sa.append(tok)
              t += 1
            }
            Row.fromSeq(r.toSeq :+ gen.toSeq)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * CONTRASTIVE DECODING under BEAMS (Li et al. 2023 §5 evaluate
   * with beam search over the CD objective; round 17, VERDICT r16
   * item 5): beam search whose per-step candidate set is each live
   * beam's EXPERT plausibility head (`p_e(j) >= alpha · max p_e`,
   * per beam over its own prefix) and whose scores accumulate the CD
   * objective `log p_expert − log p_amateur` instead of the expert
   * log-prob — tokens outside a beam's head are HARD-masked (never
   * compete for width slots), exactly the paper's formulation of the
   * search problem. The chosen token appends to BOTH models'
   * sessions (forked per kept beam).
   *
   * Determinism discipline is [[generateContrastiveDecoding]]'s:
   * 6dp-quantized log-softmaxes, dyadic alpha × grid mass for the
   * head floor, f64 accumulation pinned as `s0 + (le − la)`, ranking
   * (joint DESC, parent rank ASC, token ASC). `width = 1` reduces
   * BIT-EXACTLY to greedy contrastive decoding — per step the single
   * parent's argmax of `s0 + d(j)` is the argmax of `d(j)` under the
   * same tie order, so trajectories coincide (spec-pinned).
   *
   * Scale shape: 2×width KV sessions per row inside ONE
   * `mapPartitions`; each step is width expert+amateur logit reads
   * and at most width forks per model — no shuffle at any corpus
   * size.
   *
   * @return input columns + `outCol` = array of width beams in rank
   *         order, each an array<int> of generated tokens (fewer
   *         than width beams survive only if a head is smaller than
   *         the width at step 1)
   */
  def beamSearchContrastiveDecoding(
      df: DataFrame,
      inputCol: String,
      outCol: String,
      expert: Broadcast[TorchScriptModel],
      amateur: Broadcast[TorchScriptModel],
      steps: Int,
      width: Int,
      plausibilityAlpha: Double,
      batchSize: Int = -1): DataFrame = {
    require(steps >= 1 && width >= 1, "steps and width must be >= 1")
    require(plausibilityAlpha > 0.0 && plausibilityAlpha <= 1.0,
      "plausibilityAlpha must be in (0, 1]")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(expert.value.inDim == -1 && amateur.value.inDim == -1,
      "contrastive beam decoding needs token-input models")
    require(!expert.value.isCross && !amateur.value.isCross,
      "cross models not supported here")
    require(expert.value.outDim == amateur.value.outDim,
      "expert and amateur must share the vocabulary")
    require(width <= expert.value.outDim, "width exceeds the vocabulary")
    require(expert.value.cacheable && amateur.value.cacheable,
      "contrastive beam decoding needs the KV-session path")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(ArrayType(IntegerType)), nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val em = expert.value
      val am = amateur.value
      val vocab = em.outDim
      def q6(x: Double): Double =
        BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      def dists(lg: Array[Float]): (Array[Double], Array[Double]) = {
        var mx = Double.NegativeInfinity
        var j = 0
        while (j < vocab) {
          val v = lg(j).toDouble
          if (v > mx) mx = v
          j += 1
        }
        var z = 0.0
        j = 0
        while (j < vocab) { z += math.exp(lg(j).toDouble - mx); j += 1 }
        val lse = math.log(z) + mx
        (Array.tabulate(vocab)(k => q6(math.exp(lg(k).toDouble - mx) / z)),
          Array.tabulate(vocab)(k => q6(lg(k).toDouble - lse)))
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq :+ null)
          else {
            // beam state: (generated, CD running score, expert
            // session, amateur session)
            var beams: Seq[(Vector[Int], Double, em.DecodeSession, am.DecodeSession)] =
              Seq((Vector.empty[Int], 0.0, em.decodeSession(p), am.decodeSession(p)))
            var t = 0
            while (t < steps) {
              val cands = beams.zipWithIndex.flatMap {
                case ((gen, s0, se, sa), bi) =>
                  val (pe, le) = dists(se.logits())
                  val (_, la) = dists(sa.logits())
                  val floor = plausibilityAlpha * pe.max // dyadic × grid: exact
                  (0 until vocab).filter(pe(_) >= floor).map { j =>
                    // f64 order pinned: s0 + (le − la), the greedy
                    // CD accumulation — the width=1 reduction is
                    // bit-exact because of it
                    (s0 + (le(j) - la(j)), bi, j, (gen, se, sa))
                  }
              }
              beams = cands
                .sortBy { case (joint, bi, tok, _) => (-joint, bi, tok) }
                .take(width)
                .map { case (joint, _, tok, (gen, se, sa)) =>
                  val ce = se.fork(); ce.append(tok)
                  val ca = sa.fork(); ca.append(tok)
                  (gen :+ tok, joint, ce, ca)
                }
              t += 1
            }
            Row.fromSeq(r.toSeq :+ beams.map(_._1.toSeq))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * Teacher-forced CONTINUATION scoring under the causal LM — the
   * single-stream sibling of [[scoreSeq2SeqBatched]]: mean next-token
   * NLL of `contCol`'s tokens given `inputCol` as the prefix,
   * `-(Σ_t log softmax(logits_t)[tok_t]) / len`, each step's
   * log-softmax in f64 over the model's f32 logits. The reranking
   * half of best-of-n sampling (q244) and the generic "how likely is
   * THIS continuation" scorer (distillation filtering, candidate
   * reranking, self-consistency weighting).
   *
   * Scale shape: per-row KV sessions inside ONE `mapPartitions` —
   * the prefix ingests once, each continuation token is an O(L·d)
   * append; no shuffle at any corpus size.
   *
   * @return input columns + `outCol` double (null/empty continuation
   *         or null prefix → null)
   */
  def scoreContinuationBatched(
      df: DataFrame,
      inputCol: String,
      contCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      batchSize: Int = -1): DataFrame = {
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1,
      "scoreContinuationBatched needs a token-input model")
    require(!model.value.isCross, "cross model: use scoreSeq2SeqBatched")
    require(model.value.cacheable,
      "continuation scoring needs the KV-session path (cacheable model)")
    val withInts = graft.Spread(df)
      .withColumn(inputCol, col(inputCol).cast(ArrayType(IntegerType)))
      .withColumn(contCol, col(contCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, DoubleType, nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val cIdx = withInts.schema.fieldIndex(contCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      def ints(r: Row, idx: Int): Array[Int] =
        if (r.isNullAt(idx)) null
        else {
          val xs = r.getSeq[Any](idx)
          val a = new Array[Int](xs.length)
          var j = 0
          var ok = true
          while (ok && j < a.length) {
            xs(j) match {
              case null => ok = false
              case f: java.lang.Number => a(j) = f.intValue(); j += 1
            }
          }
          if (ok) a else null
        }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p = ints(r, inIdx)
          val c = ints(r, cIdx)
          if (p == null || p.isEmpty || c == null || c.isEmpty)
            Row.fromSeq(r.toSeq :+ null)
          else {
            val sess = m.decodeSession(p)
            var sum = 0.0
            c.foreach { tok =>
              val lg = sess.logits()
              var mx = Double.NegativeInfinity
              var j = 0
              while (j < vocab) {
                val v = lg(j).toDouble
                if (v > mx) mx = v
                j += 1
              }
              var z = 0.0
              j = 0
              while (j < vocab) { z += math.exp(lg(j).toDouble - mx); j += 1 }
              sum += lg(tok).toDouble - (math.log(z) + mx)
              sess.append(tok)
            }
            Row.fromSeq(r.toSeq :+ (-sum / c.length))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * SHARED-PREFIX greedy decoding — the prefix-caching serving shape
   * (vLLM's automatic prefix cache, SGLang's RadixAttention): rows
   * whose prompts share a common PREFIX (the system prompt, the
   * few-shot block, the task header) decode against ONE KV session
   * for that prefix, opened once per distinct prefix per batch and
   * `fork()`ed per row — the per-row cost drops from O(P²·d) prefix
   * ingest to an O(P) pointer copy plus the row's own suffix and
   * decode steps. Trajectories are BIT-IDENTICAL to
   * [[generateGreedy]] over `prefix ++ suffix` (sessions equal the
   * recompute path — spec-pinned), so the same oracle restates both.
   *
   * @param prefixCol array<int> shared-prefix column (grouping is BY
   *        VALUE — any number of distinct prefixes per batch, each
   *        opened once)
   * @param inputCol  array<int> per-row suffix (may be empty)
   * @return input columns + `outCol` = array<int> generated tokens
   *         (a NULL in EITHER column → null, as does an
   *         empty-prefix + empty-suffix row — there is nothing to
   *         decode from; an empty ARRAY in one column with tokens in
   *         the other is fine)
   */
  def generateGreedySharedPrefix(
      df: DataFrame,
      prefixCol: String,
      inputCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      batchSize: Int = -1): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1,
      "generateGreedySharedPrefix needs a token-input model")
    require(!model.value.isCross, "cross-attention model not supported here")
    require(model.value.cacheable,
      "prefix sharing needs the KV-session path (cacheable model)")
    val withInts = graft.Spread(df)
      .withColumn(prefixCol, col(prefixCol).cast(ArrayType(IntegerType)))
      .withColumn(inputCol, col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(IntegerType), nullable = true))
    val pIdx = withInts.schema.fieldIndex(prefixCol)
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      def ints(r: Row, idx: Int): Array[Int] =
        if (r.isNullAt(idx)) null
        else {
          val xs = r.getSeq[Any](idx)
          val a = new Array[Int](xs.length)
          var j = 0
          var ok = true
          while (ok && j < a.length) {
            xs(j) match {
              case null => ok = false
              case f: java.lang.Number => a(j) = f.intValue(); j += 1
            }
          }
          if (ok) a else null
        }
      def argmaxFirst(out: Array[Float]): Int = {
        var best = -1
        var bv = Float.NaN
        var j = 0
        while (j < vocab) {
          val v = out(j)
          if (!v.isNaN && (best < 0 || v > bv)) { best = j; bv = v }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      it.grouped(bs).flatMap { rows =>
        // one session per DISTINCT prefix in this batch; immutable
        // after open — every row forks it
        val cache = scala.collection.mutable.Map.empty[Vector[Int], m.DecodeSession]
        rows.iterator.map { r =>
          val p = ints(r, pIdx)
          val s = ints(r, inIdx)
          if (p == null || s == null || p.length + s.length == 0)
            Row.fromSeq(r.toSeq :+ null)
          else {
            val sess =
              if (p.isEmpty) null
              else cache.getOrElseUpdate(p.toVector, m.decodeSession(p))
            val child =
              if (sess == null) m.decodeSession(s)
              else {
                val c = sess.fork()
                s.foreach(c.append)
                c
              }
            val gen = scala.collection.mutable.ArrayBuffer.empty[Int]
            var t = 0
            while (t < steps) {
              val tid = argmaxFirst(child.logits())
              gen += tid
              child.append(tid)
              t += 1
            }
            Row.fromSeq(r.toSeq :+ gen.toSeq)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * SHALLOW FUSION greedy decoding (Gulcehre et al. 2015 — the
   * external-LM biasing an ASR/MT/domain-adaptation stack applies at
   * decode time): each step picks
   * `argmax_j logits(j) + lambda · ln p_LM(j | prev)` where `p_LM`
   * is a FROZEN add-one-smoothed token-bigram LM —
   * `(counts(prev)(j) + 1) / (rowSum(prev) + vocab)` — derived from
   * the ingest corpus (the frozen-ingest-artifact convention: the
   * count table is a bounded vocab² integer artifact, broadcast-
   * trivial). The model stays untouched; only the decode objective
   * gains the corpus prior.
   *
   * Cross-engine determinism: counts are exact integers on both
   * sides; the fused term is `dyadic lambda × ln(rational)` — ln is
   * correctly-rounded libm on both engines, and the pick's runner-up
   * gap is spec-pinned orders above any last-ulp disagreement (the
   * q96 gap-floor discipline). `lambda = 0` takes the guarded branch
   * and reduces BIT-EXACTLY to [[generateGreedy]].
   *
   * @param lmCounts vocab×vocab bigram counts (row = previous token)
   * @return input columns + `outCol` = array<int> generated tokens
   */
  def generateGreedyFused(
      df: DataFrame,
      inputCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      lmWeight: Double,
      lmCounts: Array[Array[Long]],
      batchSize: Int = -1): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    require(lmWeight >= 0.0, "lmWeight must be >= 0")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1, "generateGreedyFused needs a token-input model")
    require(!model.value.isCross, "cross-attention model not supported here")
    require(model.value.cacheable,
      "fused decoding needs the KV-session path (cacheable model)")
    val vocabN = model.value.outDim
    require(lmCounts.length == vocabN && lmCounts.forall(_.length == vocabN),
      "lmCounts must be vocab x vocab")
    // the frozen-ingest broadcast convention: the vocab² count matrix
    // (and its row sums) cross the wire once per executor, never per
    // task — a real LM vocabulary makes the closure-capture footprint
    // material even though the fixture vocab is 8
    val bcLm: Broadcast[(Array[Array[Long]], Array[Long])] =
      spark.sparkContext.broadcast((lmCounts, lmCounts.map(_.sum)))
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(IntegerType), nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      val (cnts, rsums) = bcLm.value
      def argmaxFused(out: Array[Float], prev: Int): Int = {
        var best = -1
        var bv = Double.NaN
        var j = 0
        while (j < vocab) {
          val x0 = out(j).toDouble
          val x =
            if (lmWeight == 0.0) x0 // guarded: bit-exact generateGreedy
            else x0 + lmWeight * StrictMath.log(
              (cnts(prev)(j) + 1L).toDouble /
                (rsums(prev) + vocab.toLong).toDouble)
          if (!x.isNaN && (best < 0 || x > bv)) { best = j; bv = x }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq :+ null)
          else {
            val sess = m.decodeSession(p)
            var prev = p.last
            val gen = scala.collection.mutable.ArrayBuffer.empty[Int]
            var t = 0
            while (t < steps) {
              val tid = argmaxFused(sess.logits(), prev)
              gen += tid
              sess.append(tid)
              prev = tid
              t += 1
            }
            Row.fromSeq(r.toSeq :+ gen.toSeq)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * CONTRASTIVE SEARCH (Su et al. 2022 "A Contrastive Framework for
   * Neural Text Generation" — HF `penalty_alpha` + `top_k`): at each
   * step the top-k most probable candidates re-rank by
   * `(1−α)·p(v) − α·max_i cos(h_v, h_i)` — the candidate's model
   * confidence minus its DEGENERATION PENALTY, the maximum cosine
   * between the hidden state the model would produce for it and
   * every previous position's hidden state. The look-ahead that kills
   * repetition loops greedy decoding falls into without sacrificing
   * coherence the way sampling does.
   *
   * Determinism discipline: probabilities AND cosines quantize to the
   * 6dp grid before the score (α dyadic, so the combination is exact
   * on the grid); candidates rank (p6 DESC, tid), the final pick
   * ranks (score DESC, tid) — a spec pins the score-gap floor at
   * sf0.001 so no pick hinges on last-ulp luck.
   *
   * Scale shape: per-row KV sessions; each step is k `fork()`s (the
   * candidate look-ahead — O(L·d) each, the chosen child BECOMES the
   * session so its forward is never recomputed), all inside ONE
   * `mapPartitions` — no per-step plan growth.
   *
   * @return input columns + `outCol` = array<int> generated tokens
   */
  def generateContrastive(
      df: DataFrame,
      inputCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      topK: Int,
      alpha: Double,
      batchSize: Int = -1): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1, "generateContrastive needs a token-input model")
    require(!model.value.isCross, "cross-attention model not supported here")
    require(model.value.cacheable,
      "contrastive search needs the KV-session path (cacheable model)")
    require(topK <= model.value.outDim, "topK exceeds the vocabulary")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(IntegerType), nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      def q6(x: Double): Double =
        BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      def cos6(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var j = 0
        while (j < a.length) {
          val x = a(j).toDouble; val y = b(j).toDouble
          dot += x * y; na += x * x; nb += y * y
          j += 1
        }
        q6(dot / (math.sqrt(na) * math.sqrt(nb)))
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq :+ null)
          else {
            // token-at-a-time prompt ingest records EVERY position's
            // hidden state (the penalty compares against all of them)
            var sess = m.decodeSession(Array(p(0)))
            val hiddens = scala.collection.mutable.ArrayBuffer(sess.hidden())
            p.drop(1).foreach { tok =>
              sess.append(tok); hiddens += sess.hidden()
            }
            val gen = scala.collection.mutable.ArrayBuffer.empty[Int]
            var t = 0
            while (t < steps) {
              val lg = sess.logits()
              var mx = Double.NegativeInfinity
              var j = 0
              while (j < vocab) {
                val v = lg(j).toDouble
                if (v > mx) mx = v
                j += 1
              }
              var z = 0.0
              j = 0
              while (j < vocab) { z += math.exp(lg(j).toDouble - mx); j += 1 }
              val p6 = Array.tabulate(vocab)(k => q6(math.exp(lg(k).toDouble - mx) / z))
              val cands = (0 until vocab).sortBy(k => (-p6(k), k)).take(topK)
              val scored = cands.map { v =>
                val child = sess.fork()
                child.append(v)
                val hv = child.hidden()
                var maxc = Double.NegativeInfinity
                hiddens.foreach { h =>
                  val c = cos6(hv, h)
                  if (c > maxc) maxc = c
                }
                val score = (1.0 - alpha) * p6(v) - alpha * maxc
                (score, v, child, hv)
              }
              val (_, tok, child, hv) =
                scored.sortBy { case (s0, v, _, _) => (-s0, v) }.head
              gen += tok
              sess = child // the winner's forward is never recomputed
              hiddens += hv
              t += 1
            }
            Row.fromSeq(r.toSeq :+ gen.toSeq)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * Greedy autoregressive decoding — `steps` rounds of (forward pass
   * on the whole sequence → argmax over the vocab logits → append).
   * The model must be a token-input net whose output width IS the
   * vocab (a causal decoder with an LM head); its position table must
   * cover the grown length (input cap + steps) — the interpreter
   * fails loudly past it, never wraps.
   *
   * Shape at scale: the k-step loop runs INSIDE one `mapPartitions`
   * over GEMM batches — one job, no per-step plan growth, no driver
   * round trips; each step re-runs the full prefix (the O(L²)
   * no-KV-cache form: correct-by-construction against the oracle's
   * per-step restatement, and the per-row L is capped). Argmax is the
   * repo rule: FIRST max wins, NaN never wins — exactly
   * [[graft.functions.ArgMax]] and the oracle's CASE chain.
   *
   * @return input columns + `outCol` = array<int> of the `steps`
   *         generated token ids (null input → null output)
   */
  /**
   * ENCODER-DECODER greedy generation (the T5/BART decode loop):
   * `keyCol` is the fixed source-side sequence, `queryCol` the decoder
   * prompt; each of the `steps` rounds appends the argmax next token
   * (first max wins, NaN never wins — the repo rule). Scale shape:
   * per-row incremental [[TorchScriptModel.DecodeSession]]s inside ONE
   * `mapPartitions` — the encoder leg and the cross k/v projections
   * run ONCE per row at session open, causal self-attention reads its
   * per-position cache, so step t costs O(L·d + Lk·d), not a full
   * O(L²) re-encode+recompute; logits are bit-identical to the
   * recompute path (spec-pinned).
   *
   * @return input columns + `outCol` = array<int> generated tokens
   *         (null/empty either side → null)
   */
  def generateGreedyPair(
      df: DataFrame,
      queryCol: String,
      keyCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      batchSize: Int = -1,
      eosId: Int = -1,
      minNewTokens: Int = 0): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.isCross && model.value.cacheable,
      "generateGreedyPair needs a cacheable cross-attention model " +
        "(causal decoder self-attention + last-position pool)")
    require(eosId < model.value.outDim, "eosId exceeds the vocabulary")
    require(minNewTokens >= 0, "minNewTokens must be >= 0")
    require(minNewTokens == 0 || eosId >= 0,
      "minNewTokens needs an eosId to suppress")
    val withInts = graft.Spread(df)
      .withColumn(queryCol, col(queryCol).cast(ArrayType(IntegerType)))
      .withColumn(keyCol, col(keyCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(IntegerType), nullable = true))
    val qIdx = withInts.schema.fieldIndex(queryCol)
    val kIdx = withInts.schema.fieldIndex(keyCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      // genLen gates the min-new-tokens eos suppression: while fewer
      // than minNewTokens tokens are generated, eos never becomes a
      // candidate (minNewTokens = 0 makes the guard dead code — the
      // un-floored path is byte-identical)
      def argmaxFirst(l: Array[Float], genLen: Int): Int = {
        var best = -1
        var bv = Float.NaN
        var j = 0
        while (j < vocab) {
          if (!(eosId >= 0 && j == eosId && genLen < minNewTokens) &&
              !l(j).isNaN && (best < 0 || l(j) > bv)) { best = j; bv = l(j) }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      it.grouped(bs).flatMap { rows =>
        def tokens(r: Row, idx: Int): Array[Int] = {
          if (r.isNullAt(idx)) return null
          val xs = r.getSeq[Any](idx)
          if (xs.isEmpty) return null
          val a = new Array[Int](xs.length)
          var j = 0
          while (j < a.length) {
            xs(j) match {
              case null => return null
              case f: java.lang.Number => a(j) = f.intValue()
            }
            j += 1
          }
          a
        }
        rows.iterator.map { r =>
          val q0 = tokens(r, qIdx)
          val k0 = tokens(r, kIdx)
          if (q0 == null || k0 == null) Row.fromSeq(r.toSeq :+ null)
          else {
            val sess = m.decodeSession(q0, k0)
            val gen = scala.collection.mutable.ArrayBuffer.empty[Int]
            var t = 0
            var stopped = false
            while (t < steps && !stopped) {
              val tid = argmaxFirst(sess.logits(), gen.length)
              gen += tid
              // eos stops the row (the eos itself is emitted; no
              // further session work — the serving early-exit)
              if (tid == eosId) stopped = true else sess.append(tid)
              t += 1
            }
            Row.fromSeq(r.toSeq :+ gen.toSeq)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * ENCODER-DECODER beam search — [[beamSearch]]'s candidate algebra
   * (f64 log-softmax joint scores; total order joint DESC, parent
   * rank ASC, token ASC) over [[generateGreedyPair]]'s cross-aware KV
   * sessions: the encoder runs once per row, beams FORK their parent
   * session in O(L) pointer copies. The T5 inference default.
   *
   * @return input columns + `outCol` = array<array<int>>: kept beams'
   *         generated tokens in rank order (null/empty input → null)
   */
  def beamSearchPair(
      df: DataFrame,
      queryCol: String,
      keyCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      width: Int,
      batchSize: Int = -1,
      lengthPenalty: Double = 0.0,
      eosId: Int = -1,
      banned: Set[Int] = Set.empty,
      repetitionPenalty: Double = 1.0,
      noRepeatNgram: Int = 0,
      bannedPhrases: Seq[Seq[Int]] = Nil,
      minNewTokens: Int = 0): DataFrame = {
    require(steps >= 1 && width >= 1, "steps and width must be >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.isCross && model.value.cacheable,
      "beamSearchPair needs a cacheable cross-attention model")
    require(width <= model.value.outDim, "width exceeds the vocabulary")
    require(lengthPenalty >= 0.0, "lengthPenalty must be >= 0")
    require(eosId < model.value.outDim, "eosId exceeds the vocabulary")
    require(banned.size < model.value.outDim,
      "banned set covers the whole vocabulary")
    require(repetitionPenalty > 0.0, "repetitionPenalty must be > 0")
    require(noRepeatNgram == 0 || noRepeatNgram >= 2,
      "noRepeatNgram must be 0 (off) or >= 2")
    require(bannedPhrases.forall(_.nonEmpty), "empty banned phrase")
    require(minNewTokens >= 0, "minNewTokens must be >= 0")
    require(minNewTokens == 0 || eosId >= 0,
      "minNewTokens needs an eosId to suppress")
    val plainKnobs = banned.isEmpty && repetitionPenalty == 1.0 &&
      noRepeatNgram == 0 && bannedPhrases.isEmpty && minNewTokens == 0
    val withInts = graft.Spread(df)
      .withColumn(queryCol, col(queryCol).cast(ArrayType(IntegerType)))
      .withColumn(keyCol, col(keyCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(ArrayType(IntegerType)), nullable = true))
    val qIdx = withInts.schema.fieldIndex(queryCol)
    val kIdx = withInts.schema.fieldIndex(keyCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      def logProbs(out: Array[Float]): Array[Double] = {
        var mx = Double.NegativeInfinity
        var j = 0
        while (j < vocab) {
          val v = out(j).toDouble
          if (v > mx) mx = v
          j += 1
        }
        var z = 0.0
        j = 0
        while (j < vocab) { z += math.exp(out(j).toDouble - mx); j += 1 }
        val lse = math.log(z) + mx
        Array.tabulate(vocab)(k => out(k).toDouble - lse)
      }
      it.grouped(bs).flatMap { rows =>
        def tokens(r: Row, idx: Int): Array[Int] = {
          if (r.isNullAt(idx)) return null
          val xs = r.getSeq[Any](idx)
          if (xs.isEmpty) return null
          val a = new Array[Int](xs.length)
          var j = 0
          while (j < a.length) {
            xs(j) match {
              case null => return null
              case f: java.lang.Number => a(j) = f.intValue()
            }
            j += 1
          }
          a
        }
        rows.iterator.map { r =>
          val q0 = tokens(r, qIdx)
          val k0 = tokens(r, kIdx)
          if (q0 == null || k0 == null) Row.fromSeq(r.toSeq :+ null)
          else {
            // (generated, RAW joint log-prob, session, done) — the
            // beamSearch variable-length rules over cross sessions
            var beams: Seq[(Vector[Int], Double, m.DecodeSession, Boolean)] =
              Seq((Vector.empty[Int], 0.0, m.decodeSession(q0, k0), false))
            var t = 0
            while (t < steps && beams.exists(!_._4)) {
              val cands = beams.zipWithIndex.flatMap {
                case ((g, s0, sess, true), bi) =>
                  Seq((s0 / StrictMath.pow(g.length.toDouble, lengthPenalty),
                    bi, -1, s0, (g, s0, sess, true)))
                case ((g, s0, sess, false), bi) =>
                  val lp = logProbs(sess.logits())
                  val pen =
                    StrictMath.pow((g.length + 1).toDouble, lengthPenalty)
                  if (plainKnobs)
                    (0 until vocab).map { tok =>
                      val raw = s0 + lp(tok)
                      (raw / pen, bi, tok, raw, (g, s0, sess, false))
                    }
                  else {
                    // constraints run over the DECODER-side sequence
                    // (prompt + generated) — the generateSampledPair
                    // convention; the encoder side never bans
                    val full = scala.collection.immutable.ArraySeq
                      .unsafeWrapArray(q0) ++ g
                    Beams.expand(lp, full, g.length, s0, pen, bi,
                      (g, s0, sess, false), banned, repetitionPenalty,
                      noRepeatNgram, bannedPhrases, eosId, minNewTokens)
                  }
              }
              require(cands.nonEmpty,
                "no decodable candidate: hard bans emptied every live " +
                  "beam's vocabulary")
              beams = cands.sortBy { case (n, bi, tok, _, _) => (-n, bi, tok) }
                .take(width)
                .map {
                  case (_, _, -1, _, b) => b
                  case (_, _, tok, raw, (g, _, sess, _)) =>
                    if (tok == eosId) (g :+ tok, raw, sess, true)
                    else {
                      val child = sess.fork()
                      child.append(tok)
                      (g :+ tok, raw, child, false)
                    }
                }
              t += 1
            }
            Row.fromSeq(r.toSeq :+ beams.map(_._1.toSeq))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * SAMPLED encoder-decoder decoding — [[generateGreedyPair]]'s
   * cross-aware KV sessions with [[generateSampled]]'s deterministic
   * temperature + top-p kernel (seeded md5 draws, 6-dp quantized
   * cutoffs — the identical `Sampling` code path, so the two compose
   * with no new numerics).
   */
  /** Knob parity with [[generateSampled]]: the static banned set,
    * top-k, the CTRL repetition penalty + no-repeat-n-gram (over the
    * DECODER-side sequence — the generated text), and min-p all
    * compose through the same [[Sampling]] kernel; neutral values
    * reduce bit-exactly (spec-pinned via the single-stream specs —
    * one shared code path). */
  def generateSampledPair(
      df: DataFrame,
      idCol: String,
      queryCol: String,
      keyCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      temperature: Double,
      topP: Double,
      batchSize: Int = -1,
      banned: Set[Int] = Set.empty,
      topK: Int = Int.MaxValue,
      repetitionPenalty: Double = 1.0,
      noRepeatNgram: Int = 0,
      minP: Double = 0.0): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    require(temperature > 0.0, "temperature must be > 0")
    require(topP > 0.0 && topP <= 1.0, "topP must be in (0, 1]")
    require(banned.size < model.value.outDim,
      "banned set covers the whole vocabulary")
    require(topK >= 1, "topK must be >= 1")
    require(repetitionPenalty > 0.0, "repetitionPenalty must be > 0")
    require(noRepeatNgram == 0 || noRepeatNgram >= 2,
      "noRepeatNgram must be 0 (off) or >= 2")
    require(minP >= 0.0 && minP <= 1.0, "minP must be in [0, 1]")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.isCross && model.value.cacheable,
      "generateSampledPair needs a cacheable cross-attention model")
    val withInts = graft.Spread(df)
      .withColumn(queryCol, col(queryCol).cast(ArrayType(IntegerType)))
      .withColumn(keyCol, col(keyCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(IntegerType), nullable = true))
    val qIdx = withInts.schema.fieldIndex(queryCol)
    val kIdx = withInts.schema.fieldIndex(keyCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      it.grouped(bs).flatMap { rows =>
        def tokens(r: Row, idx: Int): Array[Int] = {
          if (r.isNullAt(idx)) return null
          val xs = r.getSeq[Any](idx)
          if (xs.isEmpty) return null
          val a = new Array[Int](xs.length)
          var j = 0
          while (j < a.length) {
            xs(j) match {
              case null => return null
              case f: java.lang.Number => a(j) = f.intValue()
            }
            j += 1
          }
          a
        }
        rows.iterator.map { r =>
          val q0 = tokens(r, qIdx)
          val k0 = tokens(r, kIdx)
          if (q0 == null || k0 == null || r.isNullAt(idIdx))
            Row.fromSeq(r.toSeq :+ null)
          else {
            val id = r.getAs[Number](idIdx).longValue()
            val sess = m.decodeSession(q0, k0)
            val full = scala.collection.mutable.ArrayBuffer.from(q0)
            val gen = new Array[Int](steps)
            var t = 1
            while (t <= steps) {
              val stepBanned: Set[Int] =
                if (noRepeatNgram < 2 || full.length < noRepeatNgram - 1)
                  banned
                else {
                  val n1 = noRepeatNgram - 1
                  val suffix = full.takeRight(n1)
                  val ng = (0 to full.length - noRepeatNgram).iterator.collect {
                    case i if (0 until n1).forall(k => full(i + k) == suffix(k)) =>
                      full(i + n1)
                  }.toSet
                  if ((0 until vocab).exists(j => !banned.contains(j) && !ng(j)))
                    banned ++ ng
                  else banned
                }
              val seen: Set[Int] =
                if (repetitionPenalty != 1.0) full.toSet else Set.empty
              val tid = Sampling.sampleNext(sess.logits(), 0, vocab,
                temperature, topP, Sampling.draw(id, t),
                stepBanned, topK, seen, repetitionPenalty, minP)
              gen(t - 1) = tid
              sess.append(tid)
              full += tid
              t += 1
            }
            Row.fromSeq(r.toSeq :+ gen.toSeq)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * SAMPLED autoregressive decoding — temperature + top-p (nucleus)
   * sampling, the default generation mode in practice (Holtzman et
   * al. 2020), made exactly reproducible across engines with this
   * repo's determinism discipline (the q94/q187 recipe):
   *
   *  - the per-step random draw is SEEDED, not ambient:
   *    `u = (int64(md5("<id>:<step>")[0:8]) mod 1e6) / 1e6` — both
   *    engines restate the same md5 arithmetic, so there is no RNG to
   *    disagree about;
   *  - softmax probabilities (f64 from the f32 logits, max-shifted,
   *    logits scaled by `1/temperature`) QUANTIZE to 6 dp
   *    (HALF_UP — Spark/DuckDB `round(x, 6)`) before every discrete
   *    decision, so a pick never hinges on cross-libm exp ulps;
   *  - the nucleus is the standard minimal prefix of the
   *    `(p DESC, token ASC)` order whose cumulative mass reaches
   *    `topP` (a candidate joins while the mass BEFORE it is < topP);
   *  - within the nucleus, cumulative renormalized mass is computed
   *    sum-first-divide-once (`cumsum(p6) / total`), quantized to
   *    6 dp, and the pick is the FIRST candidate whose cumulative
   *    exceeds `u` — u lives on the 1e-6 grid and u <= 0.999999, so a
   *    pick always exists.
   *
   * `topP -> 0` keeps exactly the top-1 candidate, reducing to greedy
   * decoding (spec-pinned). `topK` composes as the OTHER standard
   * nucleus knob (every mainstream generation API ships both): the
   * candidate order is (p6 DESC, tid ASC) and both cutoffs are prefix
   * filters on it, so the kept set is `ranks 1..min(k_p, topK)` —
   * `topK >= vocab` reduces bit-exactly to pure top-p, `topK = 1` to
   * the top-1 pick (both spec-pinned). Scale shape: identical to
   * [[generateGreedy]] — the k-step loop runs INSIDE one
   * `mapPartitions` over GEMM batches, no per-step plan growth.
   *
   * @param idCol BIGINT column seeding the per-row draw chain
   * @return input columns + `outCol` = array<int> sampled token ids
   */
  def generateSampled(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      temperature: Double,
      topP: Double,
      batchSize: Int = -1,
      banned: Set[Int] = Set.empty,
      topK: Int = Int.MaxValue,
      repetitionPenalty: Double = 1.0,
      noRepeatNgram: Int = 0,
      minP: Double = 0.0,
      typicalP: Double = 1.0,
      watermarkDelta: Double = 0.0,
      watermarkGamma: (Int, Int) = (1, 2),
      lmWeight: Double = 0.0,
      lmCounts: Array[Array[Long]] = null): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    require(watermarkDelta >= 0.0, "watermarkDelta must be >= 0")
    require(watermarkGamma._1 >= 1 && watermarkGamma._1 < watermarkGamma._2,
      "watermarkGamma must be a fraction num/den with 0 < num < den")
    require(banned.size < model.value.outDim,
      "banned set covers the whole vocabulary")
    // SHALLOW FUSION under sampling: the frozen bigram prior adds to
    // the raw logits before the temperature (the watermark's slot in
    // the chain). Scoped to the pure temperature/top-p path — the
    // warper/penalty/watermark compositions are other oracles' turf.
    require(lmWeight >= 0.0, "lmWeight must be >= 0")
    require(lmWeight == 0.0 || (banned.isEmpty && topK == Int.MaxValue &&
      repetitionPenalty == 1.0 && noRepeatNgram == 0 && minP == 0.0 &&
      typicalP >= 1.0 && watermarkDelta == 0.0),
      "lmWeight composes with temperature/topP only")
    require(lmWeight == 0.0 || (lmCounts != null &&
      lmCounts.length == model.value.outDim &&
      lmCounts.forall(_.length == model.value.outDim)),
      "lmCounts must be vocab x vocab when lmWeight > 0")
    val bcLm: Broadcast[(Array[Array[Long]], Array[Long])] =
      if (lmWeight == 0.0) null
      else df.sparkSession.sparkContext.broadcast(
        (lmCounts, lmCounts.map(_.sum)))
    require(temperature > 0.0, "temperature must be > 0 (greedy is generateGreedy)")
    require(topP > 0.0 && topP <= 1.0, "topP must be in (0, 1]")
    require(topK >= 1, "topK must be >= 1")
    require(repetitionPenalty > 0.0, "repetitionPenalty must be > 0")
    require(noRepeatNgram == 0 || noRepeatNgram >= 2,
      "noRepeatNgram must be 0 (off) or >= 2")
    require(minP >= 0.0 && minP <= 1.0, "minP must be in [0, 1]")
    require(typicalP > 0.0, "typicalP must be > 0 (>= 1 is off)")
    // typical-p keeps by DEVIATION order, not the (p6 DESC, tid)
    // order the rank/floor cuts prefix — composing all three could
    // empty the kept set (the max-prob candidate is not necessarily
    // typical). Mass (topP) composes safely; the rank/floor knobs
    // belong to the other warper chain.
    require(typicalP >= 1.0 || (topK == Int.MaxValue && minP == 0.0),
      "typicalP composes with topP only (not topK/minP)")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1, "generateSampled needs a token-input model")
    require(!model.value.isCross,
      "cross-attention model: use generateGreedyPair")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(IntegerType), nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    val plain = repetitionPenalty == 1.0 && noRepeatNgram == 0
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      def draw(id: Long, step: Int): Double = Sampling.draw(id, step)
      // per-step banned set: static bans plus n-gram completions of
      // the CURRENT sequence, LIFTING the n-gram arm when it would
      // empty the allowed vocabulary (generateGreedy's rule); the
      // seen set feeds the CTRL pre-softmax rescale
      def sampleNext(out: Array[Float], off: Int, u: Double,
          full: scala.collection.IndexedSeq[Int]): Int = {
        val stepBanned: Set[Int] =
          if (plain || noRepeatNgram < 2 || full.length < noRepeatNgram - 1)
            banned
          else {
            val n1 = noRepeatNgram - 1
            val suffix = full.takeRight(n1)
            val ng = (0 to full.length - noRepeatNgram).iterator.collect {
              case i if (0 until n1).forall(k => full(i + k) == suffix(k)) =>
                full(i + n1)
            }.toSet
            if ((0 until vocab).exists(j => !banned.contains(j) && !ng(j)))
              banned ++ ng
            else banned
          }
        val seen: Set[Int] =
          if (repetitionPenalty != 1.0) full.toSet else Set.empty
        Sampling.sampleNext(out, off, vocab, temperature, topP, u,
          stepBanned, topK, seen, repetitionPenalty, minP, typicalP,
          greenPrev = if (watermarkDelta != 0.0) full.last else -1,
          greenDelta = watermarkDelta,
          greenNum = watermarkGamma._1, greenDen = watermarkGamma._2,
          fusePrev = if (lmWeight != 0.0) full.last else -1,
          fuseWeight = lmWeight,
          fuseCnts = if (bcLm == null) null else bcLm.value._1,
          fuseRows = if (bcLm == null) null else bcLm.value._2)
      }
      it.grouped(bs).flatMap { rows =>
        val seqs: Array[Array[Int]] = rows.map { r =>
          if (r.isNullAt(inIdx) || r.isNullAt(idIdx)) null
          else {
            val xs = r.getSeq[Any](inIdx)
            val a = new Array[Int](xs.length)
            var j = 0
            var ok = true
            while (ok && j < a.length) {
              xs(j) match {
                case null => ok = false
                case f: java.lang.Number => a(j) = f.intValue(); j += 1
              }
            }
            if (ok && a.nonEmpty) a else null
          }
        }.toArray
        val ids: Array[Long] = rows.map(r =>
          if (r.isNullAt(idIdx)) 0L else r.getAs[Number](idIdx).longValue()).toArray
        val gen = Array.fill(seqs.length)(
          scala.collection.mutable.ArrayBuffer.empty[Int])
        if (m.cacheable) {
          // KV-cache decode (bit-identical logits; see generateGreedy)
          seqs.zipWithIndex.foreach { case (s0, ri) =>
            if (s0 != null) {
              val sess = m.decodeSession(s0)
              val full = scala.collection.mutable.ArrayBuffer.from(s0)
              var t = 1
              while (t <= steps) {
                val tid = sampleNext(sess.logits(), 0, draw(ids(ri), t), full)
                gen(ri) += tid
                sess.append(tid)
                full += tid
                t += 1
              }
            }
          }
        } else {
          var t = 1
          var cur = seqs
          while (t <= steps) {
            val liveIdx = cur.indices.filter(cur(_) != null)
            if (liveIdx.nonEmpty) {
              val out = m.forwardTokensBatch(liveIdx.map(cur(_)).toArray)
              val next = cur.clone()
              liveIdx.zipWithIndex.foreach { case (ri, k) =>
                val tid = sampleNext(out, k * vocab, draw(ids(ri), t),
                  scala.collection.immutable.ArraySeq.unsafeWrapArray(cur(ri)))
                gen(ri) += tid
                next(ri) = cur(ri) :+ tid
              }
              cur = next
            }
            t += 1
          }
        }
        rows.iterator.zipWithIndex.map { case (r, ri) =>
          if (seqs(ri) == null) Row.fromSeq(r.toSeq :+ null)
          else Row.fromSeq(r.toSeq :+ gen(ri).toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * MULTI-RETURN sampled decoding — HF `num_return_sequences`: k
   * independent seeded trajectories PER ROW through the identical
   * [[Sampling]] kernel (temperature + nucleus), the data-augmentation
   * serving shape (k paraphrases / k candidate continuations per
   * source). Seed discipline: sequence 0 draws from `"<id>:<step>"` —
   * BIT-IDENTICAL to [[generateSampled]]'s trajectory, so k = 1
   * reduces exactly and adding sequences never changes sequence 0 —
   * and sequence s > 0 draws from `"<id>:<s>:<step>"` (both engines
   * restate the md5).
   *
   * Scale shape: one `mapPartitions`, no per-step plan growth. On the
   * KV path the k trajectories FORK one shared prompt session (the
   * prefix-sharing serving trick — the prompt's O(L·d) attention state
   * is computed once per row, each sequence pays only its own O(d)
   * decode steps); without a cacheable model all rows × sequences ride
   * one `forwardTokensBatch` per step.
   *
   * @return input columns + `outCol` = array<array<int>>: the k
   *         generated-token arrays in sequence order (null input →
   *         null)
   */
  def generateSampledK(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      temperature: Double,
      topP: Double,
      numReturnSequences: Int,
      batchSize: Int = -1): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    require(numReturnSequences >= 1, "numReturnSequences must be >= 1")
    require(temperature > 0.0, "temperature must be > 0 (greedy is generateGreedy)")
    require(topP > 0.0 && topP <= 1.0, "topP must be in (0, 1]")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1, "generateSampledK needs a token-input model")
    require(!model.value.isCross,
      "cross-attention model: use generateSampledPair")
    val k = numReturnSequences
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(ArrayType(IntegerType)), nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      it.grouped(bs).flatMap { rows =>
        val seqs: Array[Array[Int]] = rows.map { r =>
          if (r.isNullAt(inIdx) || r.isNullAt(idIdx)) null
          else {
            val xs = r.getSeq[Any](inIdx)
            val a = new Array[Int](xs.length)
            var j = 0
            var ok = true
            while (ok && j < a.length) {
              xs(j) match {
                case null => ok = false
                case f: java.lang.Number => a(j) = f.intValue(); j += 1
              }
            }
            if (ok && a.nonEmpty) a else null
          }
        }.toArray
        val ids: Array[Long] = rows.map(r =>
          if (r.isNullAt(idIdx)) 0L else r.getAs[Number](idIdx).longValue()).toArray
        val gen = Array.fill(seqs.length, k)(
          scala.collection.mutable.ArrayBuffer.empty[Int])
        if (m.cacheable) {
          seqs.zipWithIndex.foreach { case (s0, ri) =>
            if (s0 != null) {
              // ONE prompt session per row; every sequence forks it —
              // the shared prefix is attended once, per-sequence work
              // is only that sequence's own appended tokens
              val base = m.decodeSession(s0)
              var sq = 0
              while (sq < k) {
                val sess = base.fork()
                var t = 1
                while (t <= steps) {
                  val tid = Sampling.sampleNext(sess.logits(), 0, vocab,
                    temperature, topP, Sampling.draw(ids(ri), sq, t))
                  gen(ri)(sq) += tid
                  sess.append(tid)
                  t += 1
                }
                sq += 1
              }
            }
          }
        } else {
          // flatten (row, sequence) trajectories: all live entries of
          // every sequence ride ONE forwardTokensBatch per step
          val cur: Array[Array[Int]] =
            Array.tabulate(seqs.length * k)(i => seqs(i / k))
          var t = 1
          while (t <= steps) {
            val liveIdx = cur.indices.filter(cur(_) != null)
            if (liveIdx.nonEmpty) {
              val out = m.forwardTokensBatch(liveIdx.map(cur(_)).toArray)
              liveIdx.zipWithIndex.foreach { case (fi, bi) =>
                val (ri, sq) = (fi / k, fi % k)
                val tid = Sampling.sampleNext(out, bi * vocab, vocab,
                  temperature, topP, Sampling.draw(ids(ri), sq, t))
                gen(ri)(sq) += tid
                cur(fi) = cur(fi) :+ tid
              }
            }
            t += 1
          }
        }
        rows.iterator.zipWithIndex.map { case (r, ri) =>
          if (seqs(ri) == null) Row.fromSeq(r.toSeq :+ null)
          else Row.fromSeq(r.toSeq :+ gen(ri).toSeq.map(_.toSeq))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Anti-degeneration decoding controls (Keskar et al. 2019's CTRL
    * penalty; Paulus et al. 2017's no-repeat n-grams — the standard
    * `repetition_penalty` / `no_repeat_ngram_size` generation knobs):
    *
    *  - `repetitionPenalty` rescales the logit of every token already
    *    PRESENT in the sequence (prompt + generated) before the
    *    argmax: `x > 0 → x/penalty, else x·penalty`, computed in f64
    *    from the f32 logit (IEEE division/multiplication — both
    *    engines restate it bit-identically from the same logit);
    *  - `noRepeatNgram = n` bans any candidate that would complete an
    *    n-gram already present in the sequence. INTEGER-decidable (a
    *    set-membership test, no numerics). If the ban would empty the
    *    allowed vocabulary, it LIFTS for that step (deterministic,
    *    restated by the oracle) — a fail-loud there would let one
    *    pathological doc kill a 100 TB pipeline.
    *
    * Both default off; the default path is byte-identical to before. */
  /** `eosId >= 0` adds EARLY STOPPING: a row that emits eos stops
    * decoding (the eos itself is emitted; the output array is shorter
    * than `steps`) — stopped rows leave the GEMM batch, so a corpus
    * whose rows finish early costs proportionally less. `dfaTrans`
    * adds GRAMMAR-CONSTRAINED decoding (the structured-output /
    * Outlines serving shape): a `(nStates, vocab)` transition table
    * where entry `(s, t)` is the next state or −1 = forbidden; rows
    * start in state 0, each emitted token advances the state, and
    * forbidden tokens never become argmax candidates. The grammar is
    * a HARD constraint (never lifted — every state must keep at least
    * one token reachable, checked up front); it composes with the
    * static banned set, the repetition penalty, and the n-gram ban
    * (which still lifts rather than contradict the grammar).
    * `bannedPhrases` are multi-token bad-words sequences (the HF
    * `bad_words_ids` contract): a candidate that would COMPLETE any
    * phrase against the current generated+prompt suffix is hard-banned
    * for that step — single-token phrases behave exactly like the
    * static banned set. Integer-decidable; the oracle restates the
    * suffix matches over the grown token CTE.
    * `minNewTokens` (HF `min_new_tokens`, the summarization floor):
    * while FEWER than that many tokens have been generated, `eosId`
    * is hard-banned from the candidate set — the row cannot stop
    * early, and eos first becomes decodable at generated position
    * minNewTokens + 1. Integer-decidable; 0 (the default) reduces
    * bit-exactly to the un-floored path (same code, empty ban). */
  /**
   * Greedy decoding over a BOUNDED-KV session
   * ([[TorchScriptModel.decodeSessionWindowed]] — the StreamingLLM
   * serving shape, VERDICT r18 item 5): every causal attention cache
   * keeps `nSink` attention-sink positions + a sliding window of the
   * last `nWindow`, so a serving loop's per-session state is
   * O(nSink + nWindow) instead of O(L) — the eviction knob the
   * q254/q266/q272/q275 loops lacked. The decode itself is the plain
   * [[generateGreedy]] chain (first-max-wins argmax, NaN never wins);
   * only the attention visibility changes: query position P attends
   * over {0..nSink−1} ∪ {P−nWindow+1..P} at ABSOLUTE positions, so a
   * batch windowed recompute restates each step exactly (the oracle's
   * form) and `nWindow >=` the final sequence length reduces
   * BIT-EXACTLY to [[generateGreedy]] (spec-pinned — the session walks
   * identical cache rows in identical order when nothing evicts).
   *
   * Scale shape: one bounded session per row inside ONE
   * `mapPartitions` — the per-step cost drops from O(L·d) to
   * O((nSink + nWindow)·d), the point of the knob at serving scale.
   *
   * @return input columns + `outCol` = array<int> of `steps` tokens
   */
  /** `relPos = true` switches the bounded sessions to StreamingLLM's
    * re-rotation dial ([[TorchScriptModel.decodeSessionRelPos]]):
    * bias tables read at cache-slot indices, which LIFTS the model's
    * absolute-position length limit — prompts + generations may run
    * past `biasRows` with a fixed-size table. Scope-checked at
    * session open (bias-only position info: no PosEmbedOp, no RoPE). */
  def generateGreedyWindowed(
      df: DataFrame,
      inputCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      nSink: Int,
      nWindow: Int,
      batchSize: Int = -1,
      relPos: Boolean = false): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    require(nSink >= 0, "nSink must be >= 0")
    require(nWindow >= 1, "nWindow must be >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1,
      "generateGreedyWindowed needs a token-input model")
    require(!model.value.isCross, "cross-attention model not supported here")
    require(model.value.cacheable,
      "windowed decoding needs the KV-session path (cacheable model)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(IntegerType), nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      def argmaxFirst(out: Array[Float]): Int = {
        var best = -1
        var bv = Float.NaN
        var j = 0
        while (j < vocab) {
          val v = out(j)
          if (!v.isNaN && (best < 0 || v > bv)) { best = j; bv = v }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq :+ null)
          else {
            val sess = if (relPos) m.decodeSessionRelPos(p, nSink, nWindow)
                       else m.decodeSessionWindowed(p, nSink, nWindow)
            val gen = scala.collection.mutable.ArrayBuffer.empty[Int]
            var t = 0
            while (t < steps) {
              val tok = argmaxFirst(sess.logits())
              gen += tok
              sess.append(tok)
              t += 1
            }
            Row.fromSeq(r.toSeq :+ gen.toSeq)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * AUTO-WINDOW from divergence telemetry — the KV-budget edition of
   * the auto-gamma / auto-nprobe telemetry → knob closures: given a
   * ladder of candidate `windows`, greedy-decode every row ONCE per
   * rung alongside the UNBOUNDED baseline (all inside one
   * mapPartitions pass — one corpus scan prices the whole ladder) and
   * PICK the smallest nWindow whose output-divergence rate stays
   * within `divNum/divDen` — the cheapest per-session KV budget that
   * keeps serving outputs inside the quality tolerance. Divergence is
   * the INTEGER per-row flag "any emitted token differs from the
   * unbounded baseline" (token equality, no float crosses the gate),
   * the budget check is cross-multiplied (`n_diff·divDen <=
   * divNum·n_docs`), and the fallback when no rung meets it is the
   * ladder max (best effort, flagged by meets_budget = 0 everywhere).
   *
   * Scale shape: per row the rungs cost |windows| bounded sessions of
   * O(nSink + w) state each — no repeated scan, no join between
   * rungs; the output is one integer GROUP BY over (nwindow, diff)
   * pairs plus the |windows|-row pick window (telemetry-exempt, the
   * q259 convention).
   *
   * @return one row per nWindow, ordered: `nwindow` int, `n_docs`
   *         long, `n_diff` long, `meets_budget` int, `picked` int
   *         (exactly one 1)
   */
  def autoKvWindow(
      df: DataFrame,
      inputCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      nSink: Int,
      windows: Seq[Int],
      divNum: Int,
      divDen: Int,
      batchSize: Int = -1): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    require(nSink >= 0, "nSink must be >= 0")
    require(windows.nonEmpty, "windows must be non-empty")
    require(windows == windows.sorted && windows.distinct == windows,
      "windows must be strictly ascending")
    require(windows.forall(_ >= 1), "every nWindow must be >= 1")
    require(divNum >= 0 && divDen >= 1, "divergence budget must be a fraction")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1, "autoKvWindow needs a token-input model")
    require(!model.value.isCross, "cross-attention model not supported here")
    require(model.value.cacheable,
      "windowed decoding needs the KV-session path (cacheable model)")
    val withInts = graft.Spread(df).select(col(inputCol).cast(ArrayType(IntegerType))
      .as(inputCol))
    val pairSchema = StructType(Seq(
      StructField("nwindow", IntegerType, nullable = false),
      StructField("diff", IntegerType, nullable = false)))
    val maxW = windows.max
    val pairs = withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      def argmaxFirst(out: Array[Float]): Int = {
        var best = -1
        var bv = Float.NaN
        var j = 0
        while (j < vocab) {
          val v = out(j)
          if (!v.isNaN && (best < 0 || v > bv)) { best = j; bv = v }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      def gens(sess: TorchScriptModel#DecodeSession): Array[Int] = {
        val g = new Array[Int](steps)
        var t = 0
        while (t < steps) {
          val tok = argmaxFirst(sess.logits())
          g(t) = tok
          sess.append(tok)
          t += 1
        }
        g
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.flatMap { r =>
          val p: Array[Int] =
            if (r.isNullAt(0)) null
            else {
              val xs = r.getSeq[Any](0)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Iterator.empty
          else {
            val base = gens(m.decodeSession(p))
            windows.iterator.map { w =>
              val g = gens(m.decodeSessionWindowed(p, nSink, w))
              Row(w, if (java.util.Arrays.equals(g, base)) 0 else 1)
            }
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(pairSchema))
    val sweep = pairs.groupBy("nwindow")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("diff")).cast("long").as("n_diff"))
    val wAll = Window.partitionBy(lit(1))
    sweep
      .withColumn("meets_budget",
        when(col("n_diff") * divDen <= lit(divNum.toLong) * col("n_docs"), 1)
          .otherwise(0))
      .withColumn("__minMeet",
        min(when(col("meets_budget") === 1, col("nwindow"))).over(wAll))
      .select(col("nwindow"),
        col("n_docs"),
        col("n_diff"),
        col("meets_budget"),
        when(col("__minMeet").isNotNull,
          (col("nwindow") === col("__minMeet")).cast("int"))
          .otherwise((col("nwindow") === maxW).cast("int")).as("picked"))
      .orderBy("nwindow")
  }

  def generateGreedy(
      df: DataFrame,
      inputCol: String,
      outCol: String,
      model: Broadcast[TorchScriptModel],
      steps: Int,
      batchSize: Int = -1,
      banned: Set[Int] = Set.empty,
      repetitionPenalty: Double = 1.0,
      noRepeatNgram: Int = 0,
      eosId: Int = -1,
      dfaTrans: Array[Array[Int]] = null,
      bannedPhrases: Seq[Seq[Int]] = Nil,
      minNewTokens: Int = 0,
      forcedTokens: Map[Int, Int] = Map.empty,
      beginSuppress: Set[Int] = Set.empty,
      watermarkDelta: Double = 0.0,
      watermarkGamma: (Int, Int) = (1, 2)): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    require(watermarkDelta >= 0.0, "watermarkDelta must be >= 0")
    require(watermarkGamma._1 >= 1 && watermarkGamma._1 < watermarkGamma._2,
      "watermarkGamma must be a fraction num/den with 0 < num < den")
    require(bannedPhrases.forall(_.nonEmpty), "empty banned phrase")
    require(minNewTokens >= 0, "minNewTokens must be >= 0")
    require(minNewTokens == 0 || eosId >= 0,
      "minNewTokens needs an eosId to suppress")
    // forced decoder ids (HF `forced_decoder_ids` / `forced_bos` —
    // the Whisper language/task-token shape): at generation step i
    // (0-based) the token is EMITTED, not decoded — forcing overrides
    // every soft and hard constraint at its step (HF masks all other
    // logits to -inf), so it must not contradict a DFA walk
    require(forcedTokens.isEmpty || dfaTrans == null,
      "forcedTokens cannot compose with a DFA grammar")
    require(forcedTokens.forall { case (i, tok) =>
      i >= 0 && i < steps && tok >= 0 && tok < model.value.outDim },
      "forcedTokens: steps must be in [0, steps), tokens in the vocabulary")
    // begin-suppress (HF `begin_suppress_tokens`): hard-banned at the
    // FIRST generation step only — Whisper bans eos/timestamps there
    require(beginSuppress.forall(t => t >= 0 && t < model.value.outDim),
      "beginSuppress tokens must be in the vocabulary")
    require(forcedTokens.contains(0) ||
      (banned ++ beginSuppress).size < model.value.outDim,
      "beginSuppress + banned cover the whole vocabulary at step 0")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1, "generateGreedy needs a token-input model")
    require(!model.value.isCross,
      "cross-attention model: use generateGreedyPair")
    require(banned.size < model.value.outDim,
      "banned set covers the whole vocabulary")
    require(repetitionPenalty > 0.0, "repetitionPenalty must be > 0")
    require(noRepeatNgram == 0 || noRepeatNgram >= 2,
      "noRepeatNgram must be 0 (off) or >= 2")
    require(eosId < model.value.outDim, "eosId exceeds the vocabulary")
    if (dfaTrans != null) {
      val vocab = model.value.outDim
      require(dfaTrans.nonEmpty && dfaTrans.forall(_.length == vocab),
        s"dfaTrans must be (nStates, vocab=$vocab)")
      dfaTrans.zipWithIndex.foreach { case (row, st) =>
        require(row.forall(n => n >= -1 && n < dfaTrans.length),
          s"DFA state $st: next states must be -1 (forbidden) or " +
            s"< ${dfaTrans.length}")
        require(row.exists(_ != -1), s"DFA state $st allows no token")
      }
    }
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields :+
      StructField(outCol, ArrayType(IntegerType), nullable = true))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val plain = repetitionPenalty == 1.0 && noRepeatNgram == 0 &&
      eosId < 0 && dfaTrans == null && bannedPhrases.isEmpty &&
      minNewTokens == 0 && forcedTokens.isEmpty && beginSuppress.isEmpty &&
      watermarkDelta == 0.0
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      def argmaxFirst(out: Array[Float], off: Int): Int = {
        var best = -1
        var bv = Float.NaN
        var j = 0
        while (j < vocab) {
          val v = out(off + j)
          // NaN never wins; strict > keeps the FIRST max; banned ids
          // are simply never candidates (constrained decoding)
          if (!banned.contains(j) && !v.isNaN && (best < 0 || v > bv)) {
            best = j; bv = v
          }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      // the knobbed pick: seen-token logits rescale in f64, n-gram
      // completions of the CURRENT (prompt + generated) sequence are
      // banned unless that would empty the vocabulary (then the ban
      // lifts for the step — the penalty still applies)
      def argmaxAdjusted(out: Array[Float], off: Int,
          full: scala.collection.IndexedSeq[Int], state: Int,
          genLen: Int): Int = {
        // grammar and banned-phrase bans are HARD (safety semantics —
        // the bad_words_ids contract: a candidate completing any
        // banned phrase against the current suffix never decodes);
        // the n-gram ban lifts rather than contradict them
        def completesPhrase(j: Int): Boolean =
          bannedPhrases.exists { ph =>
            ph.last == j && ph.length - 1 <= full.length &&
              full.takeRight(ph.length - 1) == ph.init
          }
        def hardBanned(j: Int): Boolean =
          banned.contains(j) ||
            (dfaTrans != null && dfaTrans(state)(j) == -1) ||
            completesPhrase(j) ||
            (eosId >= 0 && j == eosId && genLen < minNewTokens) ||
            (genLen == 0 && beginSuppress.contains(j))
        val ngBanned: Set[Int] =
          if (noRepeatNgram >= 2 && full.length >= noRepeatNgram - 1) {
            val n1 = noRepeatNgram - 1
            val suffix = full.takeRight(n1)
            (0 to full.length - noRepeatNgram).iterator.collect {
              case i if (0 until n1).forall(k => full(i + k) == suffix(k)) =>
                full(i + n1)
            }.toSet
          } else Set.empty
        val seen: Set[Int] =
          if (repetitionPenalty != 1.0) full.toSet else Set.empty
        val ngLive =
          (0 until vocab).exists(j => !hardBanned(j) && !ngBanned(j))
        var best = -1
        var bv = Double.NaN
        var j = 0
        while (j < vocab) {
          if (!hardBanned(j) && !(ngLive && ngBanned(j))) {
            val x0 = out(off + j).toDouble
            val xp =
              if (seen(j)) {
                if (x0 > 0.0) x0 / repetitionPenalty
                else x0 * repetitionPenalty
              } else x0
            // soft watermark (Kirchenbauer et al. 2023): the GREEN
            // num/den of the vocabulary — md5("<prev>:<j>") mod den
            // < num, the repo's cross-engine hash discipline — gets
            // +delta on its logit before the pick; dyadic delta + the
            // exact integer predicate keeps the bias bit-identical to
            // the oracle's CASE at any rational green fraction
            val x =
              if (watermarkDelta != 0.0 &&
                  Sampling.greenToken(full.last, j,
                    watermarkGamma._1, watermarkGamma._2))
                xp + watermarkDelta
              else xp
            if (!x.isNaN && (best < 0 || x > bv)) { best = j; bv = x }
          }
          j += 1
        }
        // the up-front DFA validation checks each state in ISOLATION;
        // a pathological static-ban/phrase/DFA COMPOSITION can still
        // empty the candidate set — say so, not just "NaN"
        require(best >= 0, "no decodable token: hard bans (banned set" +
          " + DFA state + banned phrases) emptied the vocabulary, or" +
          " all remaining logits are NaN")
        best
      }
      it.grouped(bs).flatMap { rows =>
        val seqs: Array[Array[Int]] = rows.map { r =>
          if (r.isNullAt(inIdx)) null
          else {
            val xs = r.getSeq[Any](inIdx)
            val a = new Array[Int](xs.length)
            var j = 0
            var ok = true
            while (ok && j < a.length) {
              xs(j) match {
                case null => ok = false
                case f: java.lang.Number => a(j) = f.intValue(); j += 1
              }
            }
            if (ok && a.nonEmpty) a else null
          }
        }.toArray
        val gen = Array.fill(seqs.length)(
          scala.collection.mutable.ArrayBuffer.empty[Int])
        if (m.cacheable) {
          // KV-cache decode: per-row incremental sessions — each step
          // costs O(L·d), not the O(L²·d) full-prefix recompute, and
          // the per-step logits are BIT-IDENTICAL to the recompute
          // path (TorchGenerateSpec pins equality on every sf0.001
          // doc), so trajectories and oracles are unchanged.
          seqs.zipWithIndex.foreach { case (s0, ri) =>
            if (s0 != null) {
              val sess = m.decodeSession(s0)
              val full = scala.collection.mutable.ArrayBuffer.from(s0)
              var state = 0
              var t = 0
              var stopped = false
              while (t < steps && !stopped) {
                // a forced step emits without reading logits at all —
                // the session still appends (the NEXT step's state
                // needs the forced token's k/v like any other)
                val tid = forcedTokens.get(gen(ri).length) match {
                  case Some(f) => f
                  case None =>
                    val lg = sess.logits()
                    if (plain) argmaxFirst(lg, 0)
                    else argmaxAdjusted(lg, 0, full, state, gen(ri).length)
                }
                gen(ri) += tid
                if (tid == eosId) stopped = true
                else {
                  sess.append(tid)
                  if (!plain) full += tid
                  if (dfaTrans != null) state = dfaTrans(state)(tid)
                }
                t += 1
              }
            }
          }
        } else {
          var t = 0
          var cur = seqs
          val states = new Array[Int](seqs.length)
          val done = new Array[Boolean](seqs.length)
          while (t < steps) {
            val liveIdx = cur.indices.filter(i => cur(i) != null && !done(i))
            if (liveIdx.nonEmpty) {
              val out = m.forwardTokensBatch(liveIdx.map(cur(_)).toArray)
              val next = cur.clone()
              liveIdx.zipWithIndex.foreach { case (ri, k) =>
                val tid = forcedTokens.get(gen(ri).length) match {
                  case Some(f) => f
                  case None =>
                    if (plain) argmaxFirst(out, k * vocab)
                    else argmaxAdjusted(out, k * vocab,
                      scala.collection.immutable.ArraySeq.unsafeWrapArray(cur(ri)),
                      states(ri), gen(ri).length)
                }
                gen(ri) += tid
                if (tid == eosId) done(ri) = true
                else {
                  next(ri) = cur(ri) :+ tid
                  if (dfaTrans != null) states(ri) = dfaTrans(states(ri))(tid)
                }
              }
              cur = next
            }
            t += 1
          }
        }
        rows.iterator.zipWithIndex.map { case (r, ri) =>
          if (seqs(ri) == null) Row.fromSeq(r.toSeq :+ null)
          else Row.fromSeq(r.toSeq :+ gen(ri).toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * PROMPT-LOOKUP decoding (Saxena 2023; HF
   * `prompt_lookup_num_tokens` — the DRAFT-MODEL-FREE speculative
   * mode): the draft for the next tokens is the continuation of the
   * EARLIEST earlier occurrence of the prompt's final `ngram` tokens
   * inside the prompt itself — the n-gram copy heuristic that wins on
   * summarization/code/RAG inputs where the output parrots spans of
   * the input. No second model, no draft forward pass at all: the
   * draft is a table lookup, the target pays one (sessionized)
   * verification pass for up to `maxDraft + 1` emitted tokens.
   *
   * Verification is the GREEDY-equivalence rule (the q212 shape, not
   * the stochastic Leviathan rule — with a deterministic point-mass
   * draft there is nothing to resample): walk the drafts in order,
   * accept draft i iff it equals the target's argmax at that prefix;
   * the argmax at the first mismatch IS the correction, and an
   * all-accepted walk emits the target's bonus argmax at the full
   * prefix. Emitted tokens are therefore ALWAYS a prefix of the
   * plain [[generateGreedy]] rollout of length `n_accepted + 1`
   * (spec-pinned) — the lookup only decides how many greedy tokens
   * one verification pass yields.
   *
   * Match discipline (all integer decisions — nothing numeric):
   * pattern = the final `ngram` tokens of the (sliced) prompt; a
   * match is a start position strictly before the pattern's own
   * start whose `ngram` tokens equal it; the EARLIEST match wins
   * (HF's scan order); drafts = the `min(maxDraft, available)`
   * tokens following the match (≥ 1 by construction). A prompt
   * shorter than `ngram + 1`, or with no match, drafts nothing and
   * degrades to one plain greedy step (n_drafted = 0, n_accepted
   * = 0, one emitted token).
   *
   * Scale shape: ONE target KV session per row, `n_accepted + 1`
   * logit reads, inside ONE `mapPartitions` — strictly cheaper than
   * [[speculativeSampledGamma]] (no draft session) at any corpus
   * size; the lookup itself is O(L·ngram) integer scan.
   *
   * @return input columns + `draft_toks` array<int> (possibly
   *         empty), `n_drafted` int, `n_accepted` int, `out_toks`
   *         array<int> (the emitted `n_accepted + 1` greedy tokens);
   *         null prompt → all null
   */
  def generatePromptLookup(
      df: DataFrame,
      inputCol: String,
      model: Broadcast[TorchScriptModel],
      ngram: Int,
      maxDraft: Int,
      batchSize: Int = -1): DataFrame = {
    require(ngram >= 1, "ngram must be >= 1")
    require(maxDraft >= 1, "maxDraft must be >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1,
      "generatePromptLookup needs a token-input model")
    require(!model.value.isCross, "cross-attention model not supported here")
    require(model.value.cacheable,
      "prompt-lookup decoding needs the KV-session path (cacheable model)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("draft_toks", ArrayType(IntegerType), nullable = true),
      StructField("n_drafted", IntegerType, nullable = true),
      StructField("n_accepted", IntegerType, nullable = true),
      StructField("out_toks", ArrayType(IntegerType), nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      def argmaxFirst(out: Array[Float]): Int = {
        var best = -1
        var bv = Float.NaN
        var j = 0
        while (j < vocab) {
          val v = out(j)
          if (!v.isNaN && (best < 0 || v > bv)) { best = j; bv = v }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
          else {
            val drafts = lookupDraft(
              scala.collection.immutable.ArraySeq.unsafeWrapArray(p),
              ngram, maxDraft)
            val sess = m.decodeSession(p)
            val out = scala.collection.mutable.ArrayBuffer.empty[Int]
            var n = 0
            var rejected = false
            while (n < drafts.length && !rejected) {
              val t = argmaxFirst(sess.logits())
              out += t
              if (t == drafts(n)) { sess.append(t); n += 1 }
              else rejected = true // the argmax IS the correction
            }
            if (!rejected) out += argmaxFirst(sess.logits()) // bonus
            Row.fromSeq(r.toSeq ++
              Seq(drafts.toSeq, drafts.length, n, out.toSeq))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * The MULTI-DRAFT SERVING LOOP — [[speculativeSampledMultiDraft]]
   * cycled for `maxNewTokens` positions: each cycle runs one b-way
   * multi-round verification cell at the current prefix and emits
   * exactly ONE target-distributed token (an accepted draft or the
   * residual sample), which extends both sessions. Completes the
   * {cell, loop} pair for the multi-draft mode; per-position
   * `acc_rounds` is the serving telemetry (which try depth pays).
   *
   * Salts are position-offset — cycle c uses
   * `d/a{(c−1)·b + i}` and `r{c·b}` — so cycle 1 replays
   * [[speculativeSampledMultiDraft]] bit-exactly (spec-pinned).
   *
   * @return input columns + `out_toks` array<int> (exactly
   *         maxNewTokens tokens), `acc_rounds` array<int> (the
   *         per-cycle accepted round, 0 = residual-sampled); null
   *         prompt/id → all null
   */
  def speculativeSampledMultiDraftLoop(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      numDrafts: Int,
      maxNewTokens: Int,
      batchSize: Int = -1): DataFrame = {
    require(numDrafts >= 1, "numDrafts must be >= 1")
    require(maxNewTokens >= 1, "maxNewTokens must be >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "speculativeSampledMultiDraftLoop needs token-input models")
    require(!target.value.isCross && !draft.value.isCross,
      "cross models: use the pair speculative path")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "speculative sampling needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("out_toks", ArrayType(IntegerType), nullable = true),
      StructField("acc_rounds", ArrayType(IntegerType), nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def q6(x: Double): Double = Spec.q6(x)
      def draw(id: Long, salt: String): Double = Spec.draw(id, salt)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def pick(mass: Array[Double], u: Double): Int = Spec.pick(mass, u)
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx) || r.isNullAt(idIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null))
          else {
            val id = r.getAs[Number](idIdx).longValue()
            val st = tm.decodeSession(p)
            val sd = dm.decodeSession(p)
            val out = scala.collection.mutable.ArrayBuffer.empty[Int]
            val rounds = scala.collection.mutable.ArrayBuffer.empty[Int]
            var c = 0
            while (c < maxNewTokens) {
              val off = c * numDrafts
              val qp = probs6(sd.logits())
              val pp = probs6(st.logits())
              val drafts = Array.tabulate(numDrafts)(i =>
                pick(qp, draw(id, s"d${off + i + 1}")))
              val (accRound, finalTok) =
                Spec.multiRoundWalk(drafts, qp, pp, vocab, id, off)
              out += finalTok
              rounds += accRound
              st.append(finalTok)
              sd.append(finalTok)
              c += 1
            }
            Row.fromSeq(r.toSeq ++ Seq(out.toSeq, rounds.toSeq))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * STOCHASTIC prompt-lookup decoding — [[generatePromptLookup]]'s
   * n-gram drafts verified by the DISTRIBUTION-PRESERVING rule
   * instead of greedy equivalence (HF's assisted SAMPLING mode): a
   * deterministic lookup is a point-mass draft `q = δ_x`, so the
   * Leviathan acceptance specializes to `accept x_i w.p. p_i(x_i)`
   * and the rejection residual to `p_i` with `x_i` zeroed (max(0,
   * p − δ_x) ∝ p off x) — the emitted tokens are provably
   * distributed as target samples, unlike the greedy variant's
   * deterministic rollout. All-accepted walks emit a bonus sample
   * from the target at the fully-drafted prefix.
   *
   * Determinism discipline is [[speculativeSampled]]'s: 6dp-grid
   * distributions, md5 draws with position-indexed salts
   * (acceptance `"a<i>"`, residual `"r<i>"`, bonus `"b1"` — no
   * draft-pick draws: the lookup IS the draft).
   *
   * @return input columns + `draft_toks` array<int>, `n_drafted`
   *         int, `n_accepted` int, `out_toks` array<int> (length
   *         n_accepted + 1); null prompt/id → all null
   */
  def promptLookupSampled(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      model: Broadcast[TorchScriptModel],
      ngram: Int,
      maxDraft: Int,
      batchSize: Int = -1): DataFrame = {
    require(ngram >= 1, "ngram must be >= 1")
    require(maxDraft >= 1, "maxDraft must be >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1,
      "promptLookupSampled needs a token-input model")
    require(!model.value.isCross, "cross-attention model not supported here")
    require(model.value.cacheable,
      "prompt-lookup decoding needs the KV-session path (cacheable model)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("draft_toks", ArrayType(IntegerType), nullable = true),
      StructField("n_drafted", IntegerType, nullable = true),
      StructField("n_accepted", IntegerType, nullable = true),
      StructField("out_toks", ArrayType(IntegerType), nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      def q6(x: Double): Double = Spec.q6(x)
      def draw(id: Long, salt: String): Double = Spec.draw(id, salt)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def pick(mass: Array[Double], u: Double): Int = Spec.pick(mass, u)
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx) || r.isNullAt(idIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
          else {
            val id = r.getAs[Number](idIdx).longValue()
            val drafts = lookupDraft(
              scala.collection.immutable.ArraySeq.unsafeWrapArray(p),
              ngram, maxDraft)
            val sess = m.decodeSession(p)
            val out = scala.collection.mutable.ArrayBuffer.empty[Int]
            var n = 0
            var rejected = false
            while (n < drafts.length && !rejected) {
              val x = drafts(n)
              val pp = probs6(sess.logits())
              // point-mass draft: min(1, p(x)/1) = p(x), already on
              // the grid
              if (draw(id, s"a${n + 1}") < pp(x)) {
                out += x; sess.append(x); n += 1
              } else {
                // residual max(0, p − δ_x) ∝ p with x zeroed
                val mres = pp.clone()
                mres(x) = 0.0
                out += (if (mres.forall(_ == 0.0)) x
                        else pick(mres, draw(id, s"r${n + 1}")))
                rejected = true
              }
            }
            if (!rejected) // no drafts, or all accepted → bonus sample
              out += pick(probs6(sess.logits()), draw(id, "b1"))
            Row.fromSeq(r.toSeq ++
              Seq(drafts.toSeq, drafts.length, n, out.toSeq))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * TYPICAL-ACCEPTANCE tree decoding (Medusa's actual acceptance
   * rule — Cai et al. 2024 §3.2.2, after Meister et al.'s typical
   * sampling): instead of requiring the draft child to BE the
   * target's argmax ([[treeDraftGreedy]]'s exact-match mode), a
   * child x is ACCEPTED when the target deems it plausible enough —
   * `p(x) ≥ min(ε, δ·exp(−H(p)))` with H the entropy of the
   * target's distribution at that prefix — so high-entropy (flat)
   * positions tolerate more, low-entropy (peaked) positions nearly
   * require the argmax. The walk descends into the HIGHEST-p
   * accepted child per level; the first level with no accepted
   * child stops, and the emission is the accepted path + the
   * target's argmax at the final prefix (Medusa's deterministic
   * continuation). Unlike greedy equivalence, the emitted tokens
   * are NOT a greedy rollout — accepted drafts are tokens the
   * target merely tolerates — which is exactly the speed-vs-
   * fidelity dial Medusa ships.
   *
   * Determinism discipline: the decision compares 6dp-grid values —
   * p6(x) against `thr6 = q6(min(ε, δ·exp(−H6)))` where H6 =
   * −Σ p6·ln(p6) over the positive grid masses in ascending-tid f64
   * order (both engines restate the identical sum from identical
   * grid inputs; ε, δ dyadic) — and a spec pins the fixture's
   * min |p6 − thr6| margin above the grid step, so no acceptance
   * hinges on a cross-libm exp/ln last-ulp.
   *
   * @return input columns + `tree` array<array<int>> (BFS children,
   *         [[treeDraftGreedy]]'s layout), `n_accepted` int,
   *         `out_toks` array<int> (accepted path + final argmax;
   *         length n_accepted + 1); null prompt → all null
   */
  def treeDraftTypical(
      df: DataFrame,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      branch: Int,
      depth: Int,
      posteriorEps: Double,
      posteriorAlpha: Double,
      batchSize: Int = -1): DataFrame = {
    require(branch >= 1, "branch must be >= 1")
    require(depth >= 1, "depth must be >= 1")
    require(posteriorEps > 0.0 && posteriorEps <= 1.0,
      "posteriorEps must be in (0, 1]")
    require(posteriorAlpha > 0.0, "posteriorAlpha must be > 0")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "treeDraftTypical needs token-input models")
    require(!target.value.isCross && !draft.value.isCross,
      "cross-attention models not supported here")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(branch <= target.value.outDim, "branch exceeds the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "tree-draft decoding needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("tree", ArrayType(ArrayType(IntegerType)), nullable = true),
      StructField("n_accepted", IntegerType, nullable = true),
      StructField("out_toks", ArrayType(IntegerType), nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def q6(x: Double): Double = Spec.q6(x)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def argmaxFirst(out: Array[Float]): Int = {
        var best = -1
        var bv = Float.NaN
        var j = 0
        while (j < vocab) {
          val v = out(j)
          if (!v.isNaN && (best < 0 || v > bv)) { best = j; bv = v }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      def topBranch(lg: Array[Float]): Array[Int] = {
        val p6 = probs6(lg)
        (0 until vocab).sortBy(j => (-p6(j), j)).take(branch).toArray
      }
      // the typical threshold at a prefix: q6(min(ε, δ·exp(−H))) with
      // H = −Σ p6·ln(p6) over positive grid masses, ascending tid
      def threshold6(pp: Array[Double]): Double = {
        var h = 0.0
        var j = 0
        while (j < vocab) {
          if (pp(j) > 0.0) h -= pp(j) * StrictMath.log(pp(j))
          j += 1
        }
        q6(math.min(posteriorEps, posteriorAlpha * StrictMath.exp(-h)))
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            // the draft tree: treeDraftGreedy's BFS build verbatim
            val tree = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
            val childrenOf =
              scala.collection.mutable.Map.empty[Vector[Int], Array[Int]]
            var frontier: Seq[(dm.DecodeSession, Vector[Int])] =
              Seq((dm.decodeSession(p), Vector.empty))
            while (frontier.nonEmpty) {
              val next = scala.collection.mutable.ArrayBuffer
                .empty[(dm.DecodeSession, Vector[Int])]
              frontier.foreach { case (sess, path) =>
                val kids = topBranch(sess.logits())
                tree += kids.toSeq
                childrenOf(path) = kids
                if (path.length + 1 < depth) kids.foreach { c =>
                  val child = sess.fork()
                  child.append(c)
                  next += ((child, path :+ c))
                }
              }
              frontier = next.toSeq
            }
            // typical walk: accepted = children clearing the
            // entropy-scaled threshold; descend the max-p6 accepted
            // (tid tiebreak); stop at the first empty level
            val st = tm.decodeSession(p)
            val out = scala.collection.mutable.ArrayBuffer.empty[Int]
            var path = Vector.empty[Int]
            var n = 0
            var stopped = false
            while (n < depth && !stopped) {
              val pp = probs6(st.logits())
              val thr = threshold6(pp)
              val acc = childrenOf(path).filter(c => pp(c) >= thr)
              if (acc.isEmpty) stopped = true
              else {
                val c = acc.minBy(x => (-pp(x), x))
                out += c
                st.append(c)
                path :+= c
                n += 1
              }
            }
            out += argmaxFirst(st.logits()) // the deterministic continuation
            Row.fromSeq(r.toSeq ++ Seq(tree.toSeq, n, out.toSeq))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * The TYPICAL-ACCEPTANCE TREE SERVING LOOP — [[treeDraftTypical]]
   * cycled until `maxNewTokens` tokens are emitted (then truncated),
   * giving the LAST decode mode its serving loop (every other mode's
   * landed in rounds 17–19): each cycle the draft proposes a fresh
   * `branch × depth` tree at the CURRENT prefix (forks of the
   * accepted-prefix draft session), the target walks Medusa's typical
   * rule (`p6(x) ≥ q6(min(ε, δ·e^{−H}))` per level, highest-p6
   * accepted child descends), and the emitted tokens (accepted path +
   * the argmax continuation) extend BOTH sessions. The whole mode is
   * DRAW-FREE — cycles are pure functions of the prefix — so cycle 1
   * replays [[treeDraftTypical]] verbatim (spec-pinned) with no salt
   * bookkeeping at all. Cycles run to completion (cycle-level
   * `n_acc_total`, the [[speculativeSampledLoop]] convention).
   *
   * @return input columns + `out_toks` array<int> (exactly
   *         maxNewTokens tokens), `n_cycles` int, `n_acc_total` int;
   *         null prompt → all null
   */
  def treeDraftTypicalLoop(
      df: DataFrame,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      branch: Int,
      depth: Int,
      posteriorEps: Double,
      posteriorAlpha: Double,
      maxNewTokens: Int,
      batchSize: Int = -1,
      nSink: Int = -1,
      nWindow: Int = -1): DataFrame = {
    require(branch >= 1, "branch must be >= 1")
    require(depth >= 1, "depth must be >= 1")
    require(maxNewTokens >= 1, "maxNewTokens must be >= 1")
    require(posteriorEps > 0.0 && posteriorEps <= 1.0,
      "posteriorEps must be in (0, 1]")
    require(posteriorAlpha > 0.0, "posteriorAlpha must be > 0")
    // BOUNDED-KV typical-tree serving (q302): the target sessions
    // (and tree forks) evict; an attention-free early-exit draft has
    // no k/v state, so its windowed sessions are identical by
    // construction. nWindow <= 0 keeps the unbounded sessions.
    val windowed = nWindow > 0
    require(!windowed || nSink >= 0,
      "a bounded-KV loop needs nSink >= 0 alongside nWindow >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "treeDraftTypicalLoop needs token-input models")
    require(!target.value.isCross && !draft.value.isCross,
      "cross-attention models not supported here")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(branch <= target.value.outDim, "branch exceeds the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "tree-draft decoding needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("out_toks", ArrayType(IntegerType), nullable = true),
      StructField("n_cycles", IntegerType, nullable = true),
      StructField("n_acc_total", IntegerType, nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def q6(x: Double): Double = Spec.q6(x)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def argmaxFirst(out: Array[Float]): Int = {
        var best = -1
        var bv = Float.NaN
        var j = 0
        while (j < vocab) {
          val v = out(j)
          if (!v.isNaN && (best < 0 || v > bv)) { best = j; bv = v }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      def topBranch(lg: Array[Float]): Array[Int] = {
        val p6 = probs6(lg)
        (0 until vocab).sortBy(j => (-p6(j), j)).take(branch).toArray
      }
      // treeDraftTypical's threshold verbatim (one copy of the rule
      // would be nicer, but the cell's is a closure over its own
      // knobs — the spec pins cycle-1 bit-equality instead)
      def threshold6(pp: Array[Double]): Double = {
        var h = 0.0
        var j = 0
        while (j < vocab) {
          if (pp(j) > 0.0) h -= pp(j) * StrictMath.log(pp(j))
          j += 1
        }
        q6(math.min(posteriorEps, posteriorAlpha * StrictMath.exp(-h)))
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            val st = if (windowed) tm.decodeSessionWindowed(p, nSink, nWindow)
                     else tm.decodeSession(p)
            var sd = if (windowed) dm.decodeSessionWindowed(p, nSink, nWindow)
                     else dm.decodeSession(p)
            val out = scala.collection.mutable.ArrayBuffer.empty[Int]
            var cycles = 0
            var accTotal = 0
            while (out.length < maxNewTokens) {
              cycles += 1
              // this cycle's tree on forks of the draft session
              val childrenOf =
                scala.collection.mutable.Map.empty[Vector[Int], Array[Int]]
              var frontier: Seq[(dm.DecodeSession, Vector[Int])] =
                Seq((sd, Vector.empty))
              while (frontier.nonEmpty) {
                val next = scala.collection.mutable.ArrayBuffer
                  .empty[(dm.DecodeSession, Vector[Int])]
                frontier.foreach { case (sess, path) =>
                  val kids = topBranch(sess.logits())
                  childrenOf(path) = kids
                  if (path.length + 1 < depth) kids.foreach { c =>
                    val child = sess.fork()
                    child.append(c)
                    next += ((child, path :+ c))
                  }
                }
                frontier = next.toSeq
              }
              // the typical walk; emitted tokens extend BOTH sessions
              def emit(t: Int): Unit = {
                out += t
                st.append(t)
                val nd = sd.fork(); nd.append(t); sd = nd
              }
              var path = Vector.empty[Int]
              var n = 0
              var stopped = false
              while (n < depth && !stopped) {
                val pp = probs6(st.logits())
                val thr = threshold6(pp)
                val acc = childrenOf(path).filter(c => pp(c) >= thr)
                if (acc.isEmpty) stopped = true
                else {
                  val c = acc.minBy(x => (-pp(x), x))
                  emit(c)
                  path :+= c
                  n += 1
                  accTotal += 1
                }
              }
              emit(argmaxFirst(st.logits())) // the argmax continuation
            }
            Row.fromSeq(r.toSeq ++
              Seq(out.take(maxNewTokens).toSeq, cycles, accTotal))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * The TREE-DRAFT SERVING LOOP — [[treeDraftGreedy]] cycled until
   * `maxNewTokens` tokens are emitted (then truncated), completing
   * the {cell, loop, telemetry} triple for the tree mode like
   * [[speculativeSampledLoop]] did for chain drafts and
   * [[generatePromptLookupLoop]] for prompt lookup: each cycle the
   * draft proposes a fresh `branch × depth` tree at the CURRENT
   * accepted prefix, the target greedy-verifies, and the emitted
   * tokens (accepted path + correction-or-bonus) extend both
   * sessions. Greedy-equivalence again means the target session only
   * ever appends (no rollback — rejected branches never touched it)
   * and the emission IS the plain [[generateGreedy]] rollout
   * truncated to `maxNewTokens` (spec-pinned); the outputs add the
   * serving telemetry. Cycles run to completion (cycle-level
   * `n_acc_total`, the [[speculativeSampledLoop]] convention); cycle
   * 1 replays [[treeDraftGreedy]] exactly.
   *
   * @return input columns + `out_toks` array<int> (exactly
   *         maxNewTokens tokens), `n_cycles` int, `n_acc_total` int;
   *         null prompt → all null
   */
  def treeDraftGreedyLoop(
      df: DataFrame,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      branch: Int,
      depth: Int,
      maxNewTokens: Int,
      batchSize: Int = -1,
      nSink: Int = -1,
      nWindow: Int = -1,
      relPos: Boolean = false): DataFrame = {
    require(branch >= 1, "branch must be >= 1")
    require(depth >= 1, "depth must be >= 1")
    require(maxNewTokens >= 1, "maxNewTokens must be >= 1")
    // BOUNDED-KV tree serving (q301): both accepted-prefix sessions
    // (and every tree-node fork rooted at them) evict to nSink sinks
    // + an nWindow window. nWindow <= 0 keeps the unbounded sessions
    // (identical arithmetic; spec-pinned). relPos (q304) switches
    // them to the re-rotation dial — the tree loop runs past the
    // models' bias-table length.
    val windowed = nWindow > 0
    require(!windowed || nSink >= 0,
      "a bounded-KV loop needs nSink >= 0 alongside nWindow >= 1")
    require(!relPos || windowed,
      "relPos is a dial on the bounded-KV sessions (needs nWindow >= 1)")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "treeDraftGreedyLoop needs token-input models")
    require(!target.value.isCross && !draft.value.isCross,
      "cross-attention models not supported here")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(branch <= target.value.outDim, "branch exceeds the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "tree-draft decoding needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("out_toks", ArrayType(IntegerType), nullable = true),
      StructField("n_cycles", IntegerType, nullable = true),
      StructField("n_acc_total", IntegerType, nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def argmaxFirst(out: Array[Float]): Int = {
        var best = -1
        var bv = Float.NaN
        var j = 0
        while (j < vocab) {
          val v = out(j)
          if (!v.isNaN && (best < 0 || v > bv)) { best = j; bv = v }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      def topBranch(lg: Array[Float]): Array[Int] = {
        val p6 = Spec.probs6(lg, vocab)
        (0 until vocab).sortBy(j => (-p6(j), j)).take(branch).toArray
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            // the DRAFT session tracks the accepted prefix too — each
            // cycle's tree roots at a fork of it (O(L) copy), so
            // neither model ever replays the prompt
            val st = if (relPos) tm.decodeSessionRelPos(p, nSink, nWindow)
                     else if (windowed) tm.decodeSessionWindowed(p, nSink, nWindow)
                     else tm.decodeSession(p)
            var sd = if (relPos) dm.decodeSessionRelPos(p, nSink, nWindow)
                     else if (windowed) dm.decodeSessionWindowed(p, nSink, nWindow)
                     else dm.decodeSession(p)
            val out = scala.collection.mutable.ArrayBuffer.empty[Int]
            var cycles = 0
            var accTotal = 0
            while (out.length < maxNewTokens) {
              cycles += 1
              // build this cycle's tree on forks of the draft session
              val childrenOf =
                scala.collection.mutable.Map.empty[Vector[Int], Array[Int]]
              var frontier: Seq[(dm.DecodeSession, Vector[Int])] =
                Seq((sd, Vector.empty))
              while (frontier.nonEmpty) {
                val next = scala.collection.mutable.ArrayBuffer
                  .empty[(dm.DecodeSession, Vector[Int])]
                frontier.foreach { case (sess, path) =>
                  val kids = topBranch(sess.logits())
                  childrenOf(path) = kids
                  if (path.length + 1 < depth) kids.foreach { c =>
                    val child = sess.fork()
                    child.append(c)
                    next += ((child, path :+ c))
                  }
                }
                frontier = next.toSeq
              }
              // greedy verify; every emitted token extends BOTH
              // accepted-prefix sessions
              var path = Vector.empty[Int]
              var n = 0
              var rejected = false
              def emit(t: Int): Unit = {
                out += t
                st.append(t)
                val nd = sd.fork(); nd.append(t); sd = nd
              }
              while (n < depth && !rejected) {
                val t = argmaxFirst(st.logits())
                emit(t)
                if (childrenOf(path).contains(t)) {
                  path :+= t; n += 1; accTotal += 1
                } else rejected = true
              }
              if (!rejected) emit(argmaxFirst(st.logits())) // bonus
            }
            Row.fromSeq(r.toSeq ++
              Seq(out.take(maxNewTokens).toSeq, cycles, accTotal))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * MULTI-DRAFT stochastic speculative verification (the SpecInfer
   * cell — Miao et al. 2023's multi-round speculative sampling, the
   * STOCHASTIC counterpart of [[treeDraftGreedy]]'s per-level
   * accept): the draft proposes `numDrafts` INDEPENDENT token
   * samples `x_1..x_b ~ q` for ONE position, and the target runs
   * multi-round rejection: round i accepts `x_i` with probability
   * `min(1, p_i(x_i)/q(x_i))` where `p_1 = p` and each rejection
   * updates `p_{i+1} = norm(max(p_i − q, 0))`; if every round
   * rejects, the final token samples from the last residual. The
   * composition is provably target-distributed (the multi-draft
   * generalization of the Leviathan rule) — b tries at one
   * verification pass instead of one.
   *
   * Determinism discipline extends [[speculativeSampled]]'s exactly:
   * distributions on the 6dp grid; draft picks salt `"d<i>"`,
   * acceptances `"a<i>"`, the final residual pick `"r<b>"` — so
   * `numDrafts = 1` replays q247 BIT-EXACTLY (same draft token, same
   * acceptance draw, same residual walk; spec-pinned). Round-2+
   * residuals NORMALIZE on the grid (`n_i(j) = q6(m_i(j)/Σm_i)`,
   * the Σ an ascending-tid f64 sum both engines restate) because the
   * acceptance RATIO needs a normalized numerator — the final pick
   * walk itself is scale-invariant. An all-zero residual at any
   * stage (p == q on the grid) keeps the current draft token, the
   * q247 convention.
   *
   * Scale shape: one draft + one target KV session per row, ONE
   * logit read each (single position), inside ONE `mapPartitions`.
   *
   * @return input columns + `draft_toks` array<int> (the b samples),
   *         `acc_round` int (1-based accepted round; 0 = all
   *         rejected), `final_tok` int; null prompt/id → all null
   */
  def speculativeSampledMultiDraft(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      numDrafts: Int,
      batchSize: Int = -1): DataFrame = {
    require(numDrafts >= 1, "numDrafts must be >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "speculativeSampledMultiDraft needs token-input models")
    require(!target.value.isCross && !draft.value.isCross,
      "cross models: use the pair speculative path")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "speculative sampling needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("draft_toks", ArrayType(IntegerType), nullable = true),
      StructField("acc_round", IntegerType, nullable = true),
      StructField("final_tok", IntegerType, nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def draw(id: Long, salt: String): Double = Spec.draw(id, salt)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def pick(mass: Array[Double], u: Double): Int = Spec.pick(mass, u)
      // residual/normalization discipline lives in Spec.multiRoundWalk
      // (normalize ONLY where a later round's ratio needs it; the
      // final pick walks the RAW masses — numDrafts = 1 IS q247)
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx) || r.isNullAt(idIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            val id = r.getAs[Number](idIdx).longValue()
            val qp = probs6(dm.decodeSession(p).logits())
            val pp = probs6(tm.decodeSession(p).logits())
            val drafts = Array.tabulate(numDrafts)(i =>
              pick(qp, draw(id, s"d${i + 1}")))
            val (accRound, finalTok) =
              Spec.multiRoundWalk(drafts, qp, pp, vocab, id, 0)
            Row.fromSeq(r.toSeq ++ Seq(drafts.toSeq, accRound, finalTok))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * STOCHASTIC TREE verification — SpecInfer PROPER (Miao et al. 2023
   * §4.2, multi-step speculative sampling over a token tree):
   * [[treeDraftGreedy]]'s level-by-level descent composed with
   * [[speculativeSampledMultiDraft]]'s multi-round rejection applied
   * PER LEVEL over a node's children, so the emitted tokens are
   * provably target-distributed even though the draft proposed a
   * TREE. At each level the draft samples `branch` i.i.d. children
   * from q(· | prefix) (they may repeat — q269's convention) and the
   * walk runs [[Spec.multiRoundWalk]] against the target's
   * distribution at the accepted prefix: an accepted round's child
   * becomes the descent (both sessions append it); a residual-sampled
   * round (accRound = 0) emits the correction and STOPS — the
   * theorem's guarantee is per-position, so the walk below a
   * rejection has no verified prefix to stand on; a full `depth`-walk
   * earns the bonus sample from the target at the fully-accepted
   * prefix (salt `b1`). Because non-walked nodes' children are never
   * needed sequentially, the tree is LAZY — only the walked node per
   * level is sampled (a GPU server materializes the full tree to
   * batch verification in one kernel; the semantics are identical).
   *
   * Salt discipline: level ℓ (1-based) uses draft picks
   * `d<(ℓ−1)·branch+i>`, acceptances `a<(ℓ−1)·branch+i>`, residual
   * `r<ℓ·branch>`, bonus `b1` — so `branch = 1` replays
   * [[speculativeSampledGamma]] at gamma = depth EXACTLY (same draws,
   * same residual walks, same bonus; spec-pinned on out_toks and
   * n_accepted), and level 1 at any branch IS
   * [[speculativeSampledMultiDraft]]'s cell (spec-pinned). An
   * identity draft accepts round 1 at every level (ratio quantizes
   * to 1, draws < 1).
   *
   * Scale shape: one draft + one target KV session per row (appends
   * only — no forks needed on the lazy walk), O(depth·branch) picks
   * inside ONE `mapPartitions`; no shuffle at any corpus size.
   *
   * @return input columns + `tree` array<array<int>> (the WALKED
   *         node's children per level, in walk order — levels below
   *         the stop are absent), `acc_rounds` array<int> (per-level
   *         accepted round, 0 = residual-stopped), `n_accepted` int
   *         (levels descended), `out_toks` array<int> (accepted path
   *         + correction-or-bonus; length n_accepted + 1); null
   *         prompt/id → all null
   */
  def treeDraftStochastic(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      branch: Int,
      depth: Int,
      batchSize: Int = -1): DataFrame = {
    require(branch >= 1, "branch must be >= 1")
    require(depth >= 1, "depth must be >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "treeDraftStochastic needs token-input models")
    require(!target.value.isCross && !draft.value.isCross,
      "cross-attention models not supported here")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "tree-draft decoding needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("tree", ArrayType(ArrayType(IntegerType)), nullable = true),
      StructField("acc_rounds", ArrayType(IntegerType), nullable = true),
      StructField("n_accepted", IntegerType, nullable = true),
      StructField("out_toks", ArrayType(IntegerType), nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def draw(id: Long, salt: String): Double = Spec.draw(id, salt)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def pick(mass: Array[Double], u: Double): Int = Spec.pick(mass, u)
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx) || r.isNullAt(idIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
          else {
            val id = r.getAs[Number](idIdx).longValue()
            val sd = dm.decodeSession(p)
            val st = tm.decodeSession(p)
            val tree = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
            val rounds = scala.collection.mutable.ArrayBuffer.empty[Int]
            val out = scala.collection.mutable.ArrayBuffer.empty[Int]
            var level = 1
            var stopped = false
            while (level <= depth && !stopped) {
              val off = (level - 1) * branch
              val qp = probs6(sd.logits())
              val pp = probs6(st.logits())
              val drafts = Array.tabulate(branch)(i =>
                pick(qp, draw(id, s"d${off + i + 1}")))
              tree += drafts.toSeq
              val (accRound, finalTok) =
                Spec.multiRoundWalk(drafts, qp, pp, vocab, id, off)
              rounds += accRound
              out += finalTok
              if (accRound == 0) stopped = true
              else { sd.append(finalTok); st.append(finalTok) }
              level += 1
            }
            if (!stopped) out += pick(probs6(st.logits()), draw(id, "b1"))
            val nAcc = rounds.count(_ > 0)
            Row.fromSeq(r.toSeq ++
              Seq(tree.toSeq, rounds.toSeq, nAcc, out.toSeq))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * The STOCHASTIC-TREE SERVING LOOP — [[treeDraftStochastic]] cycled
   * until `maxNewTokens` tokens are emitted (then truncated),
   * completing the {cell, loop} pair for the SpecInfer-proper mode
   * like [[speculativeSampledLoop]] did for chain drafts: each cycle
   * runs the lazy per-level multi-round walk at the CURRENT prefix
   * and emits its accepted path + correction-or-bonus. No forks, no
   * rollback — the walk only ever appends target-distributed tokens
   * (accepted children during the walk, the final sample after it);
   * rejected children never touch a session.
   *
   * Salt discipline: cycle c level ℓ uses offset
   * `((c−1)·depth + (ℓ−1))·branch` for d/a (residual at
   * `offset + branch`), bonus `b<c>` — so cycle 1 replays
   * [[treeDraftStochastic]] bit-exactly (spec-pinned), and every
   * cycle's draws stay independent of partition layout. Cycles run
   * to completion (cycle-level `n_acc_total`, the
   * [[speculativeSampledLoop]] convention).
   *
   * @return input columns + `out_toks` array<int> (exactly
   *         maxNewTokens tokens), `n_cycles` int, `n_acc_total` int;
   *         null prompt/id → all null
   */
  def treeDraftStochasticLoop(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      branch: Int,
      depth: Int,
      maxNewTokens: Int,
      batchSize: Int = -1,
      nSink: Int = -1,
      nWindow: Int = -1): DataFrame = {
    require(branch >= 1, "branch must be >= 1")
    require(depth >= 1, "depth must be >= 1")
    require(maxNewTokens >= 1, "maxNewTokens must be >= 1")
    // BOUNDED-KV tree serving (q299): both rolling sessions evict to
    // nSink sinks + an nWindow window — the lazy stochastic walk only
    // ever APPENDS (no forks, no rollback), so the eviction knob
    // composes with the tree exactly as with the greedy rollout.
    // nWindow <= 0 keeps the unbounded sessions (identical
    // arithmetic; spec-pinned).
    val windowed = nWindow > 0
    require(!windowed || nSink >= 0,
      "a bounded-KV loop needs nSink >= 0 alongside nWindow >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "treeDraftStochasticLoop needs token-input models")
    require(!target.value.isCross && !draft.value.isCross,
      "cross-attention models not supported here")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "tree-draft decoding needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("out_toks", ArrayType(IntegerType), nullable = true),
      StructField("n_cycles", IntegerType, nullable = true),
      StructField("n_acc_total", IntegerType, nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    val idIdx = withInts.schema.fieldIndex(idCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def draw(id: Long, salt: String): Double = Spec.draw(id, salt)
      def probs6(lg: Array[Float]): Array[Double] = Spec.probs6(lg, vocab)
      def pick(mass: Array[Double], u: Double): Int = Spec.pick(mass, u)
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx) || r.isNullAt(idIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            val id = r.getAs[Number](idIdx).longValue()
            val sd = if (windowed) dm.decodeSessionWindowed(p, nSink, nWindow)
                     else dm.decodeSession(p)
            val st = if (windowed) tm.decodeSessionWindowed(p, nSink, nWindow)
                     else tm.decodeSession(p)
            val emitted = scala.collection.mutable.ArrayBuffer.empty[Int]
            var cycles = 0
            var accTotal = 0
            while (emitted.length < maxNewTokens) {
              cycles += 1
              var level = 1
              var stopped = false
              while (level <= depth && !stopped) {
                val off = ((cycles - 1) * depth + (level - 1)) * branch
                val qp = probs6(sd.logits())
                val pp = probs6(st.logits())
                val drafts = Array.tabulate(branch)(i =>
                  pick(qp, draw(id, s"d${off + i + 1}")))
                val (accRound, finalTok) =
                  Spec.multiRoundWalk(drafts, qp, pp, vocab, id, off)
                emitted += finalTok
                sd.append(finalTok)
                st.append(finalTok)
                if (accRound == 0) stopped = true
                else { accTotal += 1; level += 1 }
              }
              if (!stopped) {
                val bonus = pick(probs6(st.logits()), draw(id, s"b$cycles"))
                emitted += bonus
                sd.append(bonus)
                st.append(bonus)
              }
            }
            Row.fromSeq(r.toSeq ++
              Seq(emitted.take(maxNewTokens).toSeq, cycles, accTotal))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * AUTO-GAMMA from acceptance telemetry — the operator that CLOSES
   * the telemetry → knob loop the q259/q267/q270 dashboards exist
   * for: pick the serving gamma for a corpus by integer yield argmax.
   * ONE [[speculativeSampledGamma]] sweep at `maxGamma` prices every
   * smaller gamma for free: acceptance draws are position-salted
   * (`a<i>`), so a gamma-g cycle's accepted count is
   * `min(n_accepted@maxGamma, g)` — the first-rejection position
   * doesn't move when the drafting horizon shortens. Per candidate
   * gamma the corpus yield is `Σ_docs (min(n_acc, g) + 1)` emitted
   * tokens, and the pick maximizes yield per cycle cost `g + 1`
   * (g draft evals + 1 bonus/correction slot — the verification pass
   * is sessionized either way). The fraction argmax is EXACT integer
   * math: scores are `yield · (L / (g + 1))` with
   * `L = lcm(2..maxGamma+1)`, ranked (score DESC, gamma ASC) — no
   * float crosses the decision, per the quantized-decision
   * convention.
   *
   * Scale shape: the sweep is the decode mapPartitions; the histogram
   * is ONE integer groupBy over (gamma ≤ maxGamma) keys — the q259
   * telemetry exchange (exempt from the ≤1-exchange audit like every
   * GROUP-BY-over-decode-output telemetry query).
   *
   * @return one row per candidate gamma: `gamma` int, `n_docs` long,
   *         `yield_toks` long, `score` long, `picked` int (1 on the
   *         argmax row)
   */
  /** lcm over positive longs — the exact-integer scaling the
    * fraction-argmax picks ([[autoGammaYield]], [[autoBranchYield]])
    * use so no float ever crosses a knob decision. */
  private def lcmOf(xs: Seq[Long]): Long =
    xs.foldLeft(1L) { (acc, d) =>
      val g = java.math.BigInteger.valueOf(acc)
        .gcd(java.math.BigInteger.valueOf(d)).longValueExact()
      acc / g * d
    }

  def autoGammaYield(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      maxGamma: Int,
      batchSize: Int = -1): DataFrame = {
    require(maxGamma >= 1, "maxGamma must be >= 1")
    val L = lcmOf((2 to maxGamma + 1).map(_.toLong))
    val swept = speculativeSampledGamma(df, idCol, inputCol, target, draft,
        gamma = maxGamma, batchSize = batchSize)
      .filter(col("n_accepted").isNotNull)
      .select(col("n_accepted").cast("long").as("n_acc"))
    import org.apache.spark.sql.functions.{count, explode, least, lit,
      row_number, sequence, sum, when}
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("gamma"))
    swept
      .select(explode(sequence(lit(1), lit(maxGamma))).as("gamma"),
        col("n_acc"))
      .groupBy("gamma")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("n_acc"), col("gamma").cast("long")) + 1L)
          .as("yield_toks"))
      .withColumn("score",
        col("yield_toks") * (lit(L) / (col("gamma") + 1)).cast("long"))
      .withColumn("picked",
        when(row_number().over(w) === 1, 1).otherwise(0))
      .select(col("gamma"), col("n_docs"), col("yield_toks"),
        col("score"), col("picked"))
  }

  /**
   * AUTO-BRANCH from tree-acceptance telemetry — [[autoGammaYield]]'s
   * pick for the TREE mode (q270's histogram turned into a knob).
   * Unlike the gamma sweep, branch widths cannot share one run (a
   * different branch changes the sampled children and every
   * downstream draw — no salt-prefix trick), so each candidate runs
   * its own [[treeDraftStochastic]] sweep; branch = 1 is bit-exactly
   * the gamma = depth chain (spec-pinned), so the cheapest candidate
   * doubles as the chain-mode comparator. Yield per cycle is
   * `Σ (n_accepted + 1)` emitted tokens against the STATIC cycle
   * budget `branch · depth + 1` draft picks (the provisioning number
   * a server allocates per verification pass — worst-case tree size
   * plus the bonus slot). The argmax is EXACT integer math: scores
   * `yield · (lcm / cost)`, ranked (score DESC, branch ASC) — ties
   * fall to the narrower tree.
   *
   * @return one row per candidate branch: `branch` int, `n_docs`
   *         long, `yield_toks` long, `score` long, `picked` int
   */
  def autoBranchYield(
      df: DataFrame,
      idCol: String,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      branches: Seq[Int],
      depth: Int,
      batchSize: Int = -1): DataFrame = {
    require(branches.nonEmpty && branches.forall(_ >= 1),
      "branches must be >= 1")
    require(branches.distinct.length == branches.length,
      "duplicate branch candidates")
    val costs = branches.map(b => b.toLong * depth + 1L)
    val L = lcmOf(costs)
    import org.apache.spark.sql.functions.{count, lit, row_number, sum, when}
    val legs = branches.map { b =>
      treeDraftStochastic(df, idCol, inputCol, target, draft,
          branch = b, depth = depth, batchSize = batchSize)
        .filter(col("n_accepted").isNotNull)
        .select(lit(b).as("branch"),
          col("n_accepted").cast("long").as("n_acc"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("branch"))
    legs.reduce(_ unionAll _)
      .groupBy("branch")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_acc") + 1L).as("yield_toks"))
      .withColumn("score",
        col("yield_toks") *
          (lit(L) / (col("branch").cast("long") * depth + 1L)).cast("long"))
      .withColumn("picked",
        when(row_number().over(w) === 1, 1).otherwise(0))
      .select(col("branch"), col("n_docs"), col("yield_toks"),
        col("score"), col("picked"))
  }

  /**
   * The PROMPT-LOOKUP SERVING LOOP — [[generatePromptLookup]] cycled
   * until `maxNewTokens` tokens are emitted (then truncated), the
   * shape a PLD-accelerated server runs: each cycle looks the final
   * `ngram` up over the FULL current sequence (prompt + everything
   * generated so far — generated text becomes lookup corpus, which
   * is exactly why PLD compounds on repetitive outputs), drafts its
   * continuation, and greedy-verifies. Because verification is
   * greedy-equivalence, every emitted token extends the accepted
   * prefix and the ONE target KV session only ever appends — no
   * forks, no rollback (rejected drafts never touched the session;
   * the correction is the argmax already computed). Emitted tokens
   * are ALWAYS the plain [[generateGreedy]] rollout truncated to
   * `maxNewTokens` (spec-pinned); the loop's outputs add the serving
   * telemetry: how many verification cycles that rollout cost, and
   * the cycle-level acceptance count.
   *
   * A cycle always runs to completion (its full accept walk + bonus)
   * even when it overshoots `maxNewTokens` — the server truncates
   * output, not the cycle — so `n_acc_total` is CYCLE-LEVEL like
   * [[speculativeSampledLoop]]'s. Cycle 1 replays
   * [[generatePromptLookup]] exactly (same lookup, same walk —
   * spec-pinned).
   *
   * @return input columns + `out_toks` array<int> (exactly
   *         maxNewTokens tokens), `n_cycles` int, `n_acc_total` int;
   *         null prompt → all null
   */
  def generatePromptLookupLoop(
      df: DataFrame,
      inputCol: String,
      model: Broadcast[TorchScriptModel],
      ngram: Int,
      maxDraft: Int,
      maxNewTokens: Int,
      batchSize: Int = -1,
      nSink: Int = -1,
      nWindow: Int = -1,
      relPos: Boolean = false): DataFrame = {
    require(ngram >= 1, "ngram must be >= 1")
    require(maxDraft >= 1, "maxDraft must be >= 1")
    require(maxNewTokens >= 1, "maxNewTokens must be >= 1")
    require(!relPos || nWindow > 0,
      "relPos is a dial on the bounded-KV session (needs nWindow >= 1)")
    // BOUNDED-KV lookup serving (q298): the one rolling target
    // session evicts to nSink sinks + an nWindow window — the
    // LOOKUP side stays over the FULL token stream (token ids are
    // cheap; only k/v state is bounded — the StreamingLLM deployment
    // keeps the text, evicts the cache), so drafts still come from
    // anywhere in the sequence while verification runs at
    // O(nSink + nWindow) state. nWindow <= 0 keeps the unbounded
    // session (identical arithmetic; spec-pinned).
    val windowed = nWindow > 0
    require(!windowed || nSink >= 0,
      "a bounded-KV loop needs nSink >= 0 alongside nWindow >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(model.value.inDim == -1,
      "generatePromptLookupLoop needs a token-input model")
    require(!model.value.isCross, "cross-attention model not supported here")
    require(model.value.cacheable,
      "prompt-lookup decoding needs the KV-session path (cacheable model)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("out_toks", ArrayType(IntegerType), nullable = true),
      StructField("n_cycles", IntegerType, nullable = true),
      StructField("n_acc_total", IntegerType, nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val m = model.value
      val vocab = m.outDim
      def argmaxFirst(out: Array[Float]): Int = {
        var best = -1
        var bv = Float.NaN
        var j = 0
        while (j < vocab) {
          val v = out(j)
          if (!v.isNaN && (best < 0 || v > bv)) { best = j; bv = v }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            val sess = if (relPos) m.decodeSessionRelPos(p, nSink, nWindow)
                       else if (windowed) m.decodeSessionWindowed(p, nSink, nWindow)
                       else m.decodeSession(p)
            val full = scala.collection.mutable.ArrayBuffer.from(p)
            val out = scala.collection.mutable.ArrayBuffer.empty[Int]
            var cycles = 0
            var accTotal = 0
            while (out.length < maxNewTokens) {
              cycles += 1
              val drafts = lookupDraft(full, ngram, maxDraft)
              var n = 0
              var rejected = false
              while (n < drafts.length && !rejected) {
                val t = argmaxFirst(sess.logits())
                out += t; sess.append(t); full += t
                if (t == drafts(n)) { n += 1; accTotal += 1 }
                else rejected = true // the argmax IS the correction
              }
              if (!rejected) { // no drafts, or all accepted → bonus
                val t = argmaxFirst(sess.logits())
                out += t; sess.append(t); full += t
              }
            }
            Row.fromSeq(r.toSeq ++
              Seq(out.take(maxNewTokens).toSeq, cycles, accTotal))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * TREE-DRAFT speculative decoding (the Medusa / SpecInfer shape —
   * Cai et al. 2024, Miao et al. 2023): instead of one draft CHAIN,
   * the draft model proposes a TOKEN TREE — its top-`branch`
   * candidates at the prompt, then top-`branch` continuations of
   * EACH of those, `depth` levels deep — and the target verifies all
   * branches against one (sessionized) pass. A chain draft wastes
   * its whole budget when position 1 misses; a tree hedges: the
   * target's token only has to fall among `branch` siblings at each
   * level for the walk to descend.
   *
   * Verification is the GREEDY-equivalence rule (Medusa's exact-match
   * mode): t_k = the target's argmax at the accepted prefix; level k
   * accepts iff t_k is among the current tree node's children, and
   * the walk descends into that child; the first miss makes t_k the
   * correction, a full walk earns the bonus argmax. Emitted tokens
   * are therefore ALWAYS a prefix of the plain [[generateGreedy]]
   * rollout of length `n_accepted + 1` (spec-pinned) — the tree only
   * decides how many greedy tokens one verification pass yields. An
   * identity draft (draft eq target) always accepts every level: the
   * target's argmax is the draft's p6-rank-1 child by construction.
   *
   * Tree discipline: children rank by the draft's 6dp-quantized
   * softmax (p6 DESC, tid ASC) — the q241 top-k pick, a quantized
   * decision whose rank-boundary gap gets the spec-pinned floor.
   * Draft sessions FORK per node (O(L) pointer copy), so building
   * the `(branch^depth − 1)/(branch − 1)` internal nodes costs one
   * draft logit read each — the tree-attention batching a GPU server
   * does in one kernel, restated as KV-shared incremental reads.
   *
   * Scale shape: one draft session + forks and one target session
   * per row, inside ONE `mapPartitions` — no shuffle, no per-step
   * plan growth, O(branch^depth · L · d) bounded by the knobs.
   *
   * @return input columns + `tree` array<array<int>>: the children
   *         arrays in BFS node order (root's children, then each
   *         level-1 node's children left-to-right, ...; leaves have
   *         no entry), `n_accepted` int, `out_toks` array<int> (the
   *         emitted `n_accepted + 1` greedy tokens); null prompt →
   *         all null
   */
  def treeDraftGreedy(
      df: DataFrame,
      inputCol: String,
      target: Broadcast[TorchScriptModel],
      draft: Broadcast[TorchScriptModel],
      branch: Int,
      depth: Int,
      batchSize: Int = -1): DataFrame = {
    require(branch >= 1, "branch must be >= 1")
    require(depth >= 1, "depth must be >= 1")
    val spark = df.sparkSession
    val bs = if (batchSize > 0) batchSize else TorchConf.get(spark).batchSize
    require(target.value.inDim == -1 && draft.value.inDim == -1,
      "treeDraftGreedy needs token-input models")
    require(!target.value.isCross && !draft.value.isCross,
      "cross-attention models not supported here")
    require(target.value.outDim == draft.value.outDim,
      "draft and target must share the vocabulary")
    require(branch <= target.value.outDim, "branch exceeds the vocabulary")
    require(target.value.cacheable && draft.value.cacheable,
      "tree-draft decoding needs the KV-session path (cacheable models)")
    val withInts = graft.Spread(df).withColumn(inputCol,
      col(inputCol).cast(ArrayType(IntegerType)))
    val schema = StructType(withInts.schema.fields ++ Seq(
      StructField("tree", ArrayType(ArrayType(IntegerType)), nullable = true),
      StructField("n_accepted", IntegerType, nullable = true),
      StructField("out_toks", ArrayType(IntegerType), nullable = true)))
    val inIdx = withInts.schema.fieldIndex(inputCol)
    withInts.mapPartitions { it =>
      val tm = target.value
      val dm = draft.value
      val vocab = tm.outDim
      def argmaxFirst(out: Array[Float]): Int = {
        var best = -1
        var bv = Float.NaN
        var j = 0
        while (j < vocab) {
          val v = out(j)
          if (!v.isNaN && (best < 0 || v > bv)) { best = j; bv = v }
          j += 1
        }
        require(best >= 0, "all-NaN logits")
        best
      }
      def topBranch(lg: Array[Float]): Array[Int] = {
        val p6 = Spec.probs6(lg, vocab)
        (0 until vocab).sortBy(j => (-p6(j), j)).take(branch).toArray
      }
      it.grouped(bs).flatMap { rows =>
        rows.iterator.map { r =>
          val p: Array[Int] =
            if (r.isNullAt(inIdx)) null
            else {
              val xs = r.getSeq[Any](inIdx)
              val a = new Array[Int](xs.length)
              var j = 0
              var ok = true
              while (ok && j < a.length) {
                xs(j) match {
                  case null => ok = false
                  case f: java.lang.Number => a(j) = f.intValue(); j += 1
                }
              }
              if (ok && a.nonEmpty) a else null
            }
          if (p == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
          else {
            // BFS tree build: each internal node costs one draft logit
            // read on a fork. Children index by PATH (not token —
            // two same-level nodes under different parents can share
            // a token without clobbering each other's subtrees).
            val tree = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
            val childrenOf =
              scala.collection.mutable.Map.empty[Vector[Int], Array[Int]]
            var frontier: Seq[(dm.DecodeSession, Vector[Int])] =
              Seq((dm.decodeSession(p), Vector.empty))
            while (frontier.nonEmpty) {
              val next = scala.collection.mutable.ArrayBuffer
                .empty[(dm.DecodeSession, Vector[Int])]
              frontier.foreach { case (sess, path) =>
                val kids = topBranch(sess.logits())
                tree += kids.toSeq
                childrenOf(path) = kids
                if (path.length + 1 < depth) kids.foreach { c =>
                  val child = sess.fork()
                  child.append(c)
                  next += ((child, path :+ c))
                }
              }
              frontier = next.toSeq
            }
            // greedy verify along the (unique) target path
            val st = tm.decodeSession(p)
            val out = scala.collection.mutable.ArrayBuffer.empty[Int]
            var path = Vector.empty[Int]
            var n = 0
            var rejected = false
            while (n < depth && !rejected) {
              val t = argmaxFirst(st.logits())
              out += t
              if (childrenOf(path).contains(t)) {
                st.append(t); path :+= t; n += 1
              } else rejected = true // the argmax IS the correction
            }
            if (!rejected) out += argmaxFirst(st.logits()) // bonus
            Row.fromSeq(r.toSeq ++ Seq(tree.toSeq, n, out.toSeq))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
