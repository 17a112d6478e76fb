package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("minhash-LSH pairs == exact jaccard pairs on the test corpus") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain near-dup pairs")
    assert(lsh == exact)
  }

  test("containmentPairs: prefix excerpt scores C=1.0 both planted and organic; jaccard misses it") {
    import spark.implicits._
    // doc 2 = the first half of doc 1's token stream: containment
    // (2 -> 1) is exactly 1.0 while jaccard is ~0.5 — the asymmetric
    // case the symmetric rule structurally cannot flag
    val full = (1 to 40).map(i => s"w$i").mkString(" ")
    val half = (1 to 20).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, full), (2L, half), (3L, other)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq == Seq((2L, 1L, 1.0)), cont.toSeq.toString)
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.8).collect()
    assert(jac.isEmpty, "jaccard >= 0.8 should not fire on a half-doc")
    // plan shape: inverted-index join, never a cartesian
    val plan = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("jaccard/minhash/LSH plans contain no cartesian product") {
    for (df <- Seq(
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8),
        Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 0.8),
        Dedup.simHashPairs(docs, "doc_id", "text", 3, 3),
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding",
          5, 64))) {
      val plan = physicalPlan(df)
      assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"NLJ in plan:\n$plan")
    }
  }

  test("simhash pairs are near-dups (hamming<=3 implies high jaccard here)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simHashPairs(docs, "doc_id", "text", 3, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty)
    assert(sim.subsetOf(exact), s"simhash false positives: ${sim.diff(exact)}")
  }

  test("LSH ANN recall@5 vs brute force is substantial") {
    val queries = emb.filter(col("vec_id") < 50)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5, 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(approx).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall@5 = $recall")
    info(s"LSH ANN recall@5 = $recall (candidates from 4 bands x 4 bits, 16 planes)")
  }

  test("exact dedup keeps exactly one row per key, the first by order col") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c"))
      .toDF("id", "k")
    val got = Dedup.firstPerKey(df, Seq("k"), "id")
      .select("id", "k").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (3L, "b"), (5L, "c")))
  }

  test("langId picks the language with most stopword hits, und when none") {
    import spark.implicits._
    val df = Seq(
      ("the cat sat on the mat and it was good", "en"),
      ("der hund ist nicht mit der katze und das", "de"),
      ("el perro es un animal que no se ve en la casa", "es"),
      ("xyzzy qwerty plugh", "und")).toDF("text", "expected")
    val got = df.select(TextOps.langId(col("text")).as("got"), col("expected")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("rolling_hash64 expression matches the scala FNV-1a implementation") {
    graft.functions.RollingHash64.register(spark)
    import spark.implicits._
    val s = "hello graft"
    val got = Seq(Tuple1(s)).toDF("t").selectExpr("rolling_hash64(t)").collect()(0).getLong(0)
    assert(got == graft.functions.Fnv64.hash(s.getBytes("UTF-8")))
  }

  test("multimodal decode stub: plumbing appends correct deterministic metadata") {
    val withBin = docs.limit(50).select(col("doc_id"), encode(col("text"), "UTF-8").as("b"))
    val out = Multimodal.withDecodedMeta(withBin, "b", "meta")
      .select("doc_id", "meta.width", "meta.format")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    val texts = docs.limit(50).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.nonEmpty)
    texts.foreach { case (id, txt) =>
      val len = txt.getBytes("UTF-8").length.toLong
      val (w, f) = out(id)
      assert(w == (32 + len % 600).toInt)
      assert(f == Seq("jpeg", "png", "webp")((len % 3).toInt))
    }
  }

  test("frame sampling stub emits ceil(len/stride) frames per doc") {
    import spark.implicits._
    val df = Seq((1L, Array.fill[Byte](1000)(7)), (2L, Array.fill[Byte](5)(1)))
      .toDF("id", "b")
    val counts = Multimodal.sampleFrames(df, "id", "b", 256)
      .groupBy("id").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts == Map(1L -> 4L, 2L -> 1L))
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in final plan)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // one hot key carrying ~all rows, wide payload to trip the byte threshold
      val big = (0 until 40000).map(i =>
        (if (i % 100 == 0) s"k${i % 7}" else "hot", "x" * 64)).toDF("k", "pad")
      val small = (0 until 200).map(i => (if (i < 8) "hot" else s"k$i", i)).toDF("k", "v")
      // min(pad) keeps the wide payload flowing through the shuffle
      // (pruned away, partitions never cross the skew byte threshold);
      // GLOBAL agg, because a groupBy(k) right after the join would
      // require hash(k) output partitioning and AQE then declines to
      // split the join rather than add a recovery shuffle
      val joined = big.join(small, Seq("k"))
        .agg(count(lit(1)).as("n"), min("pad").as("p"))
      val rows = joined.collect() // AQE decides at runtime — execute first
      assert(rows.nonEmpty)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted join equals plain join and splits keys across salts") {
    import spark.implicits._
    // heavily skewed big side: 10k rows on key "hot", a few on others
    val big = (Seq.fill(10000)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val small = Seq(("hot", 1), ("a", 2), ("b", 3), ("c", 4), ("unused", 5)).toDF("k", "v")
    val plain = big.join(small, Seq("k")).groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", 8)
      .groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("embedding near-dup pairs: finds planted near-duplicates, no false accepts") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 200 random unit-ish vectors + 10 planted near-dups (tiny perturbation)
    val base = (0 until 200).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val dups = (0 until 10).map { i =>
      val (id, v) = base(i)
      (1000L + id, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val df = (base ++ dups).map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val got = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.98, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 10).map(i => (i.toLong, 1000L + i)).toSet
    assert(got == expected, s"got $got")
  }

  test("IVF top-k: recall vs brute force, and no cartesian in the plan") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 4)
    val got = ivf.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall@5 too low: $recall")
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("two-level packBins == naive global-window prefix sum") {
    import org.apache.spark.sql.expressions.Window
    val toks = graft.operators.TextOps.tokenCount(col("text"))
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs.select(col("doc_id"), toks.as("n_tokens"))
      .withColumn("before", coalesce(sum("n_tokens").over(w), lit(0)))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("before") / 2048).cast("long").as("bin"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // small groupSize so the test actually exercises multiple groups
    val fast = Pack.packBins(docs, "doc_id", toks, 2048L, groupSize = 32L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fast == naive)
  }

  test("jaccardPairs maxDocFreq: loose cap == unpruned; tight cap stays well-formed") {
    val unpruned = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loose = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8, maxDocFreq = Some(1000000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == unpruned, "a cap above every df must not change the result")
    val tight = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8, maxDocFreq = Some(3))
      .collect()
    tight.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0)
    }
  }

  test("jaccardPairs tight maxDocFreq == hand-computed pruned-space jaccard") {
    import spark.implicits._
    // 2-gram shingles: d1 {a·b, b·c, c·x}, d2 {a·b, b·c, c·y},
    // d3 {a·b, b·z, z·w}, d4 {a·b, b·q, q·r}; df(a·b)=4, df(b·c)=2.
    val df = Seq(
      (1L, "a b c x"), (2L, "a b c y"), (3L, "a b z w"), (4L, "a b q r"))
      .toDF("doc_id", "text")
    // cap=3 prunes exactly a·b; pruned sets: d1 {b·c, c·x}, d2 {b·c, c·y},
    // d3 {b·z, z·w}, d4 {b·q, q·r} -> only (1,2) share anything:
    // jaccard over the PRUNED space = 1/(2+2-1) = 1/3, vs 2/4 unpruned.
    val pruned = Dedup.jaccardPairs(df, "doc_id", "text", 2, 0.3, maxDocFreq = Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pruned.toSeq == Seq((1L, 2L, 1.0 / 3.0)))
    val unpruned = Dedup.jaccardPairs(df, "doc_id", "text", 2, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(unpruned.toSeq == Seq((1L, 2L, 0.5)))
  }

  test("packBins rejects a non-numeric id column up front") {
    import spark.implicits._
    val df = Seq(("a", 10), ("b", 20)).toDF("doc_id", "n")
    val e = intercept[IllegalArgumentException] {
      Pack.packBins(df, "doc_id", col("n"), 100L)
    }
    assert(e.getMessage.contains("numeric idCol"))
  }

  test("asofJoin rejects reserved internal names and asof_ output collisions") {
    import spark.implicits._
    val l = Seq((1L, 10L, 1L)).toDF("k", "t", "tie")
    val r = Seq((1L, 9L, 1L, 5.0)).toDF("k", "t", "tie", "v")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(l.withColumn("__side", lit(1)), r, "k", "t", "tie")
    }
    assert(e1.getMessage.contains("reserves internal column names"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(l.withColumn("asof_v", lit(0)), r, "k", "t", "tie")
    }
    assert(e2.getMessage.contains("asof_"))
  }

  test("lsh_band_keys with declared dim raises on any other dimension") {
    import spark.implicits._
    val df = Seq((1L, Seq.fill(8)(0.5)), (2L, Seq.fill(4)(0.5))).toDF("id", "e")
    val e = intercept[Exception] {
      df.select(
        graft.functions.LshBandKeys.lsh_band_keys(spark, col("e"), 16, 4, dim = 8))
        .collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("dimension"),
      s"unexpected: ${e}")
    // declared dim matching every row: fine, and keys are the same as
    // the first-seen-pin path
    val declared = df.filter(col("id") === 1L)
      .select(graft.functions.LshBandKeys.lsh_band_keys(spark, col("e"), 16, 4, dim = 8))
      .collect()(0).getSeq[Long](0)
    val pinned = df.filter(col("id") === 1L)
      .select(graft.functions.LshBandKeys.lsh_band_keys(spark, col("e"), 16, 4))
      .collect()(0).getSeq[Long](0)
    assert(declared == pinned)
  }

  test("intervalJoin == naive range join, and plan has no cartesian") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val probes = (0 until 300)
      .map(i => (i.toLong, s"u${rnd.nextInt(10)}", rnd.nextInt(100000).toLong))
      .toDF("pid", "k", "t")
    val build = (0 until 500)
      .map(i => (s"u${rnd.nextInt(10)}", rnd.nextInt(100000).toLong, i.toLong))
      .toDF("k", "bt", "bid")
    val got = RangeJoin.intervalJoin(probes, build, "k", "t", "bt", 5000L)
      .select("pid", "ij_bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = probes.join(build,
        probes("k") === build("k") && build("bt") >= probes("t") - 5000L
          && build("bt") <= probes("t"))
      .select("pid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.nonEmpty)
    val plan = RangeJoin.intervalJoin(probes, build, "k", "t", "bt", 5000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a product plan:\n$plan")
  }

  test("connectedComponents labels chains, cliques, and singletons correctly") {
    import spark.implicits._
    // two chains (1-2-3-4, 10-11), one clique (20,21,22), isolated via df
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val comp = Components.connectedComponents(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    val all = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L, 22L, 99L).toDF("id")
    val clusters = Components.dedupClusters(all, "id", edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = clusters.map(c => c._1 -> c).toMap
    assert(byId(99L) == ((99L, 99L, true)), "singleton is its own survivor")
    assert(byId(4L) == ((4L, 1L, false)) && byId(1L)._3)
    assert(clusters.count(_._3) == 4, "one survivor per cluster (3 clusters + singleton)")
  }

  test("chunkByTokens: stride/overlap cover every token, texts reconstruct") {
    import spark.implicits._
    val txt = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, txt)).toDF("doc_id", "text")
    val got = Chunk.chunkByTokens(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("chunk_no")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    // chunk 2 already reaches the last token — a 4th chunk "t10" would
    // sit entirely inside chunk 2's overlap (verbatim duplicate)
    assert(got.toSeq == Seq(
      (0, "t1 t2 t3 t4", 4), (1, "t4 t5 t6 t7", 4),
      (2, "t7 t8 t9 t10", 4)))
    // exact-fit doc: one chunk, no ghost trailing chunk
    val exact = Chunk.chunkByTokens(
      Seq((1L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text", 4, 1)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(exact.toSeq == Seq((0, "a b c d", 4)))
    // token-less docs emit NO chunks (no phantom 1-token "" chunk)
    val empties = Seq((1L, ""), (2L, "   \t  "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Chunk.chunkByTokens(empties, "doc_id", "text", 4, 1).count() == 0)
  }

  test("chunkByContent: boundary rule, reconstruction, and insertion robustness") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(400)("w" + rnd.nextInt(5000))
    val base = words.mkString(" ")
    def chunksOf(text: String): Seq[String] =
      Chunk.chunkByContent(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", 8)
        .orderBy("chunk_no").collect().map(_.getString(2)).toSeq

    val got = chunksOf(base)
    // reconstruction: chunks concatenate back to the original token stream
    assert(got.mkString(" ") == base)
    // naive reimplementation of the boundary rule
    def h(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md, 16)
    }
    val naive = {
      val out = Seq.newBuilder[String]
      var cur = List.empty[String]
      for (w <- words) {
        cur = w :: cur
        if (h(w) % 8 == 0) { out += cur.reverse.mkString(" "); cur = Nil }
      }
      if (cur.nonEmpty) out += cur.reverse.mkString(" ")
      out.result()
    }
    assert(got == naive, "HOF disagrees with the naive boundary walk")
    assert(got.length > 5, s"divisor 8 over 400 words should yield many chunks: ${got.length}")

    // insertion robustness: adding one (non-boundary) word changes AT
    // MOST the single chunk it lands in; every other chunk is identical
    val insertAt = 199
    val fillerIdx = words.indexWhere(w => h(w) % 8 != 0)
    assert(fillerIdx >= 0, "need at least one non-boundary word in the sample")
    val filler = words(fillerIdx) // reuse a known non-boundary word
    val edited = (words.take(insertAt) ++ Seq(filler) ++ words.drop(insertAt)).mkString(" ")
    val got2 = chunksOf(edited)
    assert(math.abs(got2.length - got.length) <= 0,
      "a non-boundary insertion cannot change the chunk count")
    assert(got2.zip(got).count { case (a, b) => a != b } <= 1,
      "more than one chunk changed after a single insertion")

    // token-less docs emit nothing
    val empties = Seq((1L, ""), (2L, " \t "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Chunk.chunkByContent(empties, "doc_id", "text", 8).count() == 0)

    // max-size clamp: a boundary-free word run closes at maxChunk
    // (bounds the accumulator on adversarial docs); boundary words
    // reset the count
    val noB = words.filter(w => h(w) % 8 != 0).take(10)
    val clamped = Chunk.chunkByContent(
      Seq((1L, noB.mkString(" "))).toDF("doc_id", "text"), "doc_id", "text",
      divisor = 8, maxChunk = 4)
      .orderBy("chunk_no").collect().map(r => (r.getString(2), r.getInt(3)))
    assert(clamped.map(_._2).toSeq == Seq(4, 4, 2), s"clamp sizes: ${clamped.toSeq}")
    assert(clamped.map(_._1).mkString(" ") == noB.mkString(" "))
  }

  test("Mix.rebalance: binding stratum keeps all rows, others are hash-thresholded") {
    import spark.implicits._
    val df = ((0 until 10).map(i => (i.toLong, "a")) ++
      (100 until 200).map(i => (i.toLong, "b"))).toDF("id", "s")
    val kept = Mix.rebalance(df, "s", "id", Map("a" -> 0.5, "b" -> 0.5))
      .groupBy("s").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // T = min(10/0.5, 100/0.5) = 20 -> a keeps 100% (10), b keeps 10%
    assert(kept("a") == 10L)
    val expectedB = df.filter(col("s") === "b")
      .filter(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100000000L < 10000000L)
      .count()
    assert(kept.getOrElse("b", 0L) == expectedB && expectedB > 0)
  }

  test("Mix.temperatureSample: tau=0.5 flattens via sqrt rates; tau=1 is identity; tau=2 sharpens") {
    import spark.implicits._
    // strata: a=16 rows, b=64 rows -> tau=0.5 weights 4, 8; rates 1.0
    // and 0.5 -> a keeps all 16, b keeps bucket < 50000000
    val df = ((0 until 16).map(i => (i.toLong, "a")) ++
      (100 until 164).map(i => (i.toLong, "b"))).toDF("id", "s")
    val kept = Mix.temperatureSample(df, "s", "id", tau = 0.5)
      .groupBy("s").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(kept("a") == 16L)
    val expectedB = df.filter(col("s") === "b")
      .filter(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100000000L < 50000000L)
      .count()
    assert(kept.getOrElse("b", 0L) == expectedB && expectedB > 0)
    // tau=1: the natural mix passes through untouched
    assert(Mix.temperatureSample(df, "s", "id", tau = 1.0).count() == 80L)
    // tau=2 (sharpening): the LARGE stratum binds (keeps 100%), the
    // small one is down-sampled at rate N_a/N_b = 0.25
    val sharp = Mix.temperatureSample(df, "s", "id", tau = 2.0)
      .groupBy("s").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sharp("b") == 64L)
    val expectedA = df.filter(col("s") === "a")
      .filter(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100000000L < 25000000L)
      .count()
    assert(sharp.getOrElse("a", 0L) == expectedA)
  }

  test("Mix.rebalance: sub-1e-4 keep rates survive quantization (no vanished strata)") {
    import spark.implicits._
    // heavy stratum vs tiny binding stratum: heavy's rate = 5e-5, which
    // the old 1/10000 floor grid quantized to ZERO, silently deleting a
    // stratum meant to be half the mix
    val df = ((0L until 100000L).map(i => (i, "web")) ++
      (1000000L until 1000005L).map(i => (i, "books"))).toDF("id", "s")
    val kept = Mix.rebalance(df, "s", "id", Map("web" -> 0.5, "books" -> 0.5))
      .groupBy("s").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // T = min(1e5/0.5, 5/0.5) = 10 -> books keeps 100%, web keeps 5e-5
    assert(kept("books") == 5L, s"binding stratum shaved: $kept")
    // expectation 5 rows; hash-binomial noise, but ZERO would mean the
    // stratum vanished
    assert(kept.getOrElse("web", 0L) > 0, s"web stratum vanished: $kept")
  }

  test("flagContaminated: shared 8-gram span flags the doc, clean doc passes") {
    import spark.implicits._
    val benchTxt = (1 to 20).map(i => s"b$i").mkString(" ")
    val bench = Seq(Tuple1(benchTxt)).toDF("text")
    // doc 1 embeds a 10-token span of the benchmark -> 3 shared 8-grams
    val span = (5 to 14).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, s"x y $span z w"),
      (2L, (1 to 20).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val byId = Decontaminate
      .flagContaminated(corpus, "doc_id", "text", bench, "text", n = 8, minHits = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(byId(1L) == ((3L, true)))
    assert(byId(2L) == ((0L, false)))
  }

  test("contaminationFraction: length-normalized verdicts, zero-gram docs never flagged") {
    import spark.implicits._
    val benchTxt = (1 to 20).map(i => s"b$i").mkString(" ")
    val bench = Seq(Tuple1(benchTxt)).toDF("text")
    // doc 1: a 10-token benchmark span inside 14 tokens -> 7 grams,
    // 3 contaminated -> frac 3/7 >= 0.25 -> flagged
    val span = (5 to 14).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, s"x y $span z w"),
      // doc 2: the same 3 contaminated grams diluted in 40 tokens ->
      // 33 grams, frac 3/33 < 0.25 -> clean (q64's absolute rule
      // would flag it at minHits=3 — the normalization is the point)
      (2L, s"$span " + (1 to 30).map(i => s"d$i").mkString(" ")),
      (3L, (1 to 20).map(i => s"c$i").mkString(" ")), // no overlap
      (4L, "too short")) // < 8 tokens: zero grams
      .toDF("doc_id", "text")
    val got = Decontaminate
      .contaminationFraction(corpus, "doc_id", "text", bench, "text",
        n = 8, minFrac = 0.25)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((7L, 3L, 3.0 / 7, true)))
    assert(got(2L) == ((33L, 3L, 3.0 / 33, false)))
    assert(got(3L) == ((13L, 0L, 0.0, false)))
    assert(got(4L) == ((0L, 0L, 0.0, false)))
  }

  test("rarityScore: hand-computed corpus frequencies and per-doc rates") {
    import spark.implicits._
    // corpus bigrams: "a b" x3 (docs 1,2,3), "b c" x2 (docs 1,2),
    // "c d" x1 (doc 1 only), "x y" x1 (doc 4)
    val df = Seq(
      (1L, "a b c d"), (2L, "a b c"), (3L, "a b"), (4L, "x y"), (5L, "solo"))
      .toDF("doc_id", "text")
    val got = LmScore.rarityScore(df, "doc_id", "text", rareThreshold = 1L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((3L, 1L, math.floor(1.0 / 3 * 1000000) / 1000000))) // only "c d" rare
    assert(got(2L) == ((2L, 0L, 0.0)))
    assert(got(3L) == ((1L, 0L, 0.0)))
    assert(got(4L) == ((1L, 1L, 1.0))) // "x y" unique in corpus
    assert(got(5L) == ((0L, 0L, 0.0))) // no bigrams at all
  }

  test("int8 quantization: values in range, dequant error <= scale/2, zeros safe") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = ((0 until 50).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian()))) :+
      (99L, Seq.fill(16)(0.0))).toDF("vec_id", "embedding")
    val rows = Quantize.int8(df, "embedding")
      .select(col("vec_id"), col("embedding"), col("scale"),
        col("qvec"), Quantize.dequant(col("qvec"), col("scale")).as("dq"))
      .collect()
    rows.foreach { r =>
      val scale = r.getDouble(2)
      val q = r.getSeq[Int](3)
      assert(q.forall(v => v >= -127 && v <= 127), s"out of range: $q")
      if (r.getLong(0) == 99L) { assert(scale == 0.0 && q.forall(_ == 0)) }
      else {
        val orig = r.getSeq[Double](1)
        val dq = r.getSeq[Double](4)
        orig.zip(dq).foreach { case (o, d) =>
          assert(math.abs(o - d) <= scale / 2 + 1e-12, s"error > scale/2: $o vs $d") }
      }
    }
  }

  test("connectedComponents matches union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = touched.map(id => id -> {
        // min node id in the component among touched nodes
        val root = find(id.toInt)
        touched.filter(t => find(t.toInt) == root).min
      }).toMap
      val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected)
    }
  }

  test("tfIdf topTerms: hand-computed scores and ranking") {
    import spark.implicits._
    val df = Seq((1L, "apple banana apple"), (2L, "banana cherry"), (3L, "apple"))
      .toDF("doc_id", "text")
    val got = TfIdf.topTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    // N=3; df(apple)=2, df(banana)=2, df(cherry)=1
    // idf(apple/banana)=ln(4/3)+1, idf(cherry)=ln(2)+1
    assert(got.toSeq == Seq(
      (1L, 1, "apple", 2L), (1L, 2, "banana", 1L),
      (2L, 1, "cherry", 1L), (2L, 2, "banana", 1L),
      (3L, 1, "apple", 1L)))
    val s = TfIdf.topTerms(df, "doc_id", "text", 2)
      .filter(col("doc_id") === 1 && col("rank") === 1)
      .collect()(0).getDouble(4)
    assert(s == math.floor(2.0 * (math.log(4.0 / 3.0) + 1.0) * 1e6) / 1e6)
  }

  test("winnowing: shared >= k+w-1 token run guarantees a shared fingerprint") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"s$i").mkString(" ") // 12-token shared run
    val df = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three $shared four"),
      (3L, (1 to 30).map(i => s"u$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(df, "doc_id", "text", k = 5, w = 4, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // the shared run is 12 >= k+w-1 = 8 tokens -> guaranteed detection;
    // whole-doc jaccard at 0.8 would never flag these
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.8)
      .collect()
    assert(jac.isEmpty)
  }

  test("funnel stages: staged minimums, >= semantics, partial funnels") {
    import spark.implicits._
    import graft.streaming.Event
    val ev = Seq(
      // user 1 completes: view@10, click@10 (same sec ok), purchase@30
      Event(1, 10, 1, "view", 0), Event(2, 10, 1, "click", 0),
      Event(3, 30, 1, "purchase", 0),
      // user 2: click BEFORE any view never counts
      Event(4, 5, 2, "click", 0), Event(5, 10, 2, "view", 0),
      // user 3: purchase before click -> stage stops at view
      Event(6, 10, 3, "view", 0), Event(7, 5, 3, "purchase", 0)).toDS()
    val got = graft.operators.Funnel.funnelStages(ev)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(got(1L) == ((3, Some(10L), Some(10L), Some(30L))))
    assert(got(2L) == ((1, Some(10L), None, None)))
    assert(got(3L) == ((1, Some(10L), None, None)))
  }

  test("crossCorpusPairs == exact cross-half jaccard pairs on the test corpus") {
    val left = docs.filter(col("doc_id") < 250)
    val right = docs.filter(col("doc_id") >= 250)
    val got = Dedup.crossCorpusPairs(left, right, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = all.filter { case (a, b) => (a < 250) != (b < 250) }
      .map { case (a, b) => if (a < 250) (a, b) else (b, a) }.toSet
    assert(got == expected && got.nonEmpty)
  }

  test("chunk reconstruction property: overlap-stripped concat == original tokens") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val docsRnd = (0 until 30).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(9)}").mkString(" "))
    }.toDF("doc_id", "text")
    val (chunkSize, overlap) = (7, 3)
    val chunks = Chunk.chunkByTokens(docsRnd, "doc_id", "text", chunkSize, overlap)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    docsRnd.collect().foreach { r =>
      val (id, txt) = (r.getLong(0), r.getString(1))
      val toks = txt.split("\\s+").toSeq
      val rebuilt = chunks(id).zipWithIndex.flatMap { case (c, i) =>
        val ct = c.split("\\s+").toSeq
        if (i == 0) ct else ct.drop(overlap)
      }
      assert(rebuilt == toks, s"doc $id: $rebuilt != $toks")
    }
  }

  test("Mix.rebalance property: kept shares track targets within hash noise") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (0 until 6000).map { i =>
      val s = rnd.nextInt(10) match {
        case x if x < 6 => "web" // 60%
        case x if x < 9 => "books" // 30%
        case _ => "code" // 10%
      }
      (i.toLong, s)
    }.toDF("id", "s")
    val targets = Map("web" -> 0.3, "books" -> 0.3, "code" -> 0.4)
    val before = df.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Mix.rebalance(df, "s", "id", targets)
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // T = min(n_s / p_s) -> binding stratum (code: ~600/0.4) keeps ~100%
    val t = targets.keys.map(s => before(s) / targets(s)).min
    targets.foreach { case (s, p) =>
      val expect = p * t
      val tol = 4 * math.sqrt(expect) + 1 // binomial 4-sigma
      assert(math.abs(kept(s) - expect) <= tol,
        s"$s kept ${kept(s)} vs target $expect (tol $tol)")
    }
  }

  test("winnowing guarantee property: exactly k+w-1 shared tokens always detected") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val k = 4; val w = 3
    val cases = (0 until 10).map { t =>
      val runLen = k + w - 1 // the minimal guaranteed-detection length
      val shared = (0 until runLen).map(_ => s"s${t}_${rnd.nextInt(5)}").mkString(" ")
      val pad1 = (0 until 10).map(_ => s"a${t}_${rnd.nextInt(50)}").mkString(" ")
      val pad2 = (0 until 10).map(_ => s"b${t}_${rnd.nextInt(50)}").mkString(" ")
      Seq((t * 2L, s"$pad1 $shared"), (t * 2 + 1L, s"$shared $pad2"))
    }
    val df = cases.flatten.toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(df, "doc_id", "text", k, w, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach { t =>
      assert(pairs.contains((t * 2L, t * 2 + 1L)),
        s"case $t: planted ${k + w - 1}-token run not detected")
    }
  }

  test("byte histogram features: exact bins, normalization, near-dup composition") {
    import spark.implicits._
    val df = Seq(
      (1L, Array[Byte](0, 0, 1, 1)),
      (2L, Array[Byte](0, 0, 1, 2)),
      (3L, Array.fill[Byte](100)(7))).toDF("id", "b")
    val feats = Multimodal.byteHistogramFeatures(df, "b", "f")
    val byId = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(byId(1L)(0) == 0.5f && byId(1L)(1) == 0.5f && byId(1L).sum == 1.0f)
    assert(byId(3L)(7) == 1.0f)
    // histogram vectors feed the similarity operators unchanged
    val top = Similarity.bruteForceTopK(
      feats.select(col("id").as("vec_id"), col("f").as("embedding")),
      feats.filter(col("id") === 1L).select(col("id").as("vec_id"), col("f").as("embedding")),
      "vec_id", "embedding", k = 1)
      .collect()(0)
    assert(top.getLong(2) == 2L, s"nearest to doc1 should be doc2: $top")
  }

  test("resize stub: target size respected, short payloads pass through, null safe") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("b", BinaryType)))
    val rows = java.util.Arrays.asList(
      Row(1, Array.range(0, 100).map(_.toByte)), Row(2, Array[Byte](1, 2)), Row(3, null))
    val df = spark.createDataFrame(rows, schema)
    val out = Multimodal.resizeStub(df, "b", "small", 10)
      .collect().map(r => r.getInt(0) -> Option(r.getAs[Array[Byte]](2))).toMap
    assert(out(1).get.length == 10 && out(1).get(0) == 0 && out(1).get(1) == 10)
    assert(out(2).get.toSeq == Seq[Byte](1, 2))
    assert(out(3).isEmpty)
  }

  test("punctCount counts punctuation characters only") {
    import spark.implicits._
    val got = Seq(Tuple1("a, b. c! d")).toDF("t")
      .select(TextOps.punctCount(col("t"))).collect()(0).getInt(0)
    assert(got == 3)
  }

  test("operator argument guards fail fast with clear messages") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunk.chunkByTokens(df, "doc_id", "text", chunkSize = 4, overlap = 4)
    } // overlap must be < chunkSize
    intercept[IllegalArgumentException] {
      Chunk.chunkByTokens(df, "doc_id", "text", chunkSize = 0, overlap = 0)
    }
    intercept[IllegalArgumentException] {
      Mix.rebalance(df.withColumnRenamed("text", "s"), "s", "doc_id", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Mix.rebalance(df.withColumnRenamed("text", "s"), "s", "doc_id", Map("x" -> 0.0))
    } // shares must be positive
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(df, df.toDF("doc_id", "text"), "doc_id", "a", "b", 0L)
    } // window must be positive
    intercept[IllegalArgumentException] {
      Winnow.fingerprints(df, "doc_id", "text", k = 0, w = 1)
    }
    intercept[IllegalArgumentException] {
      Decontaminate.flagContaminated(df, "doc_id", "text", df, "text", n = 8, minHits = 0)
    }
    intercept[IllegalArgumentException] {
      LmScore.rarityScore(df, "doc_id", "text", rareThreshold = 0L)
    }
    intercept[IllegalArgumentException] {
      TfIdf.topTerms(df, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      graft.sources.Sink.compact(spark, "/tmp/nonexistent", targetFileBytes = 0L)
    }
  }

  test("int8 quantization preserves cosine geometry (ANN-over-quantized story)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = (0 until 200).map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    val dq = Quantize.int8(df, "embedding")
      .select(col("vec_id"),
        Quantize.dequant(col("qvec"), col("scale")).as("embedding"))
    val queries = df.filter(col("vec_id") < 10)
    val origTop = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val qTop = Similarity.bruteForceTopK(dq,
        Quantize.int8(queries, "embedding")
          .select(col("vec_id"),
            Quantize.dequant(col("qvec"), col("scale")).as("embedding")),
        "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = (origTop & qTop).size.toDouble / origTop.size
    assert(overlap >= 0.8,
      s"quantization degraded top-3 overlap to $overlap (int8 on gaussian vectors)")
  }

  test("null inputs: torch UDF and batched path yield null, not NPE") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    graft.functions.ArgMax.register(spark)
    val m = graft.torch.Torch.createFunction(spark, "graft_iris_nulls",
      "/root/reference/model/iris.spt")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("features", ArrayType(DoubleType))))
    val rows = java.util.Arrays.asList(
      Row(1, Seq(5.1, 3.5, 1.4, 0.2)), Row(2, null),
      Row(3, Seq(5.1, null, 1.4, 0.2))) // null ELEMENT, not null array
    val df = spark.createDataFrame(rows, schema)
    val viaUdf = df.selectExpr("id", "graft_iris_nulls(features) AS logits")
      .collect().sortBy(_.getInt(0))
    assert(viaUdf(0).getSeq[Float](1).length == 3 && viaUdf(1).isNullAt(1)
      && viaUdf(2).isNullAt(1))
    val bc = spark.sparkContext.broadcast(m)
    val batched = graft.torch.Torch.inferBatched(df, "features", "logits", bc, 8)
      .collect().sortBy(_.getInt(0))
    assert(batched(0).getSeq[Float](2).length == 3 && batched(1).isNullAt(2)
      && batched(2).isNullAt(2))
  }

  test("createFunction rejects the (float, double) combination like the reference") {
    import org.apache.spark.sql.types._
    intercept[UnsupportedOperationException] {
      graft.torch.Torch.createFunction(spark, "graft_bad_combo",
        "/root/reference/model/iris.spt", FloatType, DoubleType)
    }
  }

  test("multimodal decode: null payload yields null meta, not NPE") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("payload", BinaryType)))
    val rows = java.util.Arrays.asList(
      Row(1, "abc".getBytes), Row(2, null))
    val df = spark.createDataFrame(rows, schema)
    val out = Multimodal.withDecodedMeta(df, "payload", "meta")
      .collect().sortBy(_.getInt(0))
    assert(!out(0).isNullAt(1) && out(1).isNullAt(1))
  }

  test("drop-and-recreate rebinds function config (reference lib.rs:81-84 flow)") {
    // the reference documents that a function binds its config at
    // CREATE time; changing settings requires drop + re-create. Mirror:
    // register, DROP TEMPORARY FUNCTION via SQL, re-create under a new
    // batch_size — the registry reflects the recreation, not an error.
    graft.torch.Torch.createFunction(spark, "graft_iris_rebind",
      "/root/reference/model/iris.spt")
    assert(spark.catalog.functionExists("graft_iris_rebind"))
    spark.sql("DROP TEMPORARY FUNCTION graft_iris_rebind")
    assert(!spark.catalog.functionExists("graft_iris_rebind"))
    spark.conf.set(graft.torch.TorchConf.BatchSizeKey, "8")
    try {
      graft.torch.Torch.createFunction(spark, "graft_iris_rebind",
        "/root/reference/model/iris.spt")
      assert(spark.catalog.functionExists("graft_iris_rebind"))
      val n = spark.read.parquet("/root/reference/data/iris.snappy.parquet")
        .selectExpr("graft_iris_rebind(features) AS p").count()
      assert(n == 314)
    } finally spark.conf.unset(graft.torch.TorchConf.BatchSizeKey)
  }

  test("model loads from a file: URL (Hadoop-FS URL source path, Q15)") {
    val m = graft.torch.TorchScriptModel.load("file:///root/reference/model/iris.spt")
    assert(m.inDim == 4 && m.outDim == 3)
  }

  test("tokenBudgetSample: budget respected within one doc, deterministic, per stratum") {
    import spark.implicits._
    val docs = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i * 10L))
      .toDF("id", "src", "toks")
    val kept = Mix.tokenBudgetSample(docs, "src", "id", col("toks"), budgetPerStratum = 500L)
    val bySrc = kept.groupBy("src").agg(sum("toks").as("t"), max("toks").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((src, (total, mx)) <- bySrc) {
      assert(total - mx < 500L, s"$src: prefix before last doc must be under budget")
      assert(total >= 500L || docs.filter(col("src") === src).agg(sum("toks"))
        .collect()(0).getLong(0) == total, s"$src: stopped early with budget left")
    }
    // deterministic: same selection on re-run
    val again = Mix.tokenBudgetSample(docs, "src", "id", col("toks"), 500L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == kept.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("tokenBudgetSample two-level prefix sum is bit-identical to the naive window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 3 strata x ~700 rows plus a NULL stratum (a stratum of its own
    // under Window.partitionBy null-grouping — the join must be
    // null-safe or these rows silently vanish)
    val docs = (1 to 2000).map(i =>
        (i.toLong * 7919L, if (i % 11 == 0) null else s"s${i % 3}", (i % 97 + 1).toLong))
      .toDF("id", "src", "toks")
    val twoLevel = Mix.tokenBudgetSample(docs, "src", "id", col("toks"), 9000L)
      .select("id", "tokens_before").as[(Long, Long)].collect().toMap
    val wNaive = Window.partitionBy("src")
      .orderBy(md5(col("id").cast("string")), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("tokens_before", coalesce(sum(col("toks")).over(wNaive), lit(0L)))
      .filter(col("tokens_before") < 9000L)
      .select("id", "tokens_before").as[(Long, Long)].collect().toMap
    assert(twoLevel == naive, "two-level prefix sum diverged from the naive window")
  }

  test("curriculumOrder two-level prefix sum is bit-identical to the naive window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 2000).map(i => (i.toLong * 104729L, (i % 100).toDouble))
      .toDF("id", "score")
    val twoLevel = Shuffle.curriculumOrder(df, "id", col("score"), Seq(40.0, 70.0), "s7")
      .select("id", "phase", "pos").as[(Long, Int, Int)].collect().toSet
    val phase = Seq(40.0, 70.0).foldLeft(lit(0))((acc, t) =>
      acc + when(col("score") >= t, 1).otherwise(0))
    val wNaive = Window.partitionBy("phase")
      .orderBy(md5(concat(lit("s7:"), col("id").cast("string"))), col("id"))
    val naive = df.withColumn("phase", phase)
      .withColumn("pos", row_number().over(wNaive))
      .select("id", "phase", "pos").as[(Long, Int, Int)].collect().toSet
    assert(twoLevel == naive, "two-level prefix sum diverged from the naive window")
  }

  test("normalizeText: NFC composition, control strip, whitespace collapse, idempotent") {
    import spark.implicits._
    val in = Seq(
      "Café",                      // decomposed -> composed
      "abc",                 // control debris stripped
      "xy",                        // \x0B stripped, NOT a space (RE2 parity)
      "  a \t\n  b  ",                   // runs collapse, ends trim
      "plain ascii",                     // untouched
      "").toDF("s")
    val out = in.select(TextOps.normalizeText(spark, col("s")).as("n"))
      .collect().map(_.getString(0))
    assert(out === Array("Café", "abc", "xy", "a b", "plain ascii", ""))
    // idempotence: normalize(normalize(s)) == normalize(s)
    val twice = in.select(TextOps.normalizeText(spark,
      TextOps.normalizeText(spark, col("s"))).as("n")).collect().map(_.getString(0))
    assert(twice === out)
    // null-safe
    val n = Seq[Option[String]](None).toDF("s")
      .select(TextOps.normalizeText(spark, col("s"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("flagContaminatedBloom == flagContaminated's contaminated slice") {
    import spark.implicits._
    // planted corpus: two docs verbatim-share bench text, one partial,
    // rest clean; the bloom path must reproduce the exact rule
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // full copy
      (2L, "pre alpha beta gamma delta epsilon zeta eta theta post"),   // 2 shared 8-grams
      (3L, "totally unrelated words that never overlap anything here at all"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa and tail words"))
      .toDF("doc_id", "text")
    val exact = Decontaminate.flagContaminated(
      corpus, "doc_id", "text", bench, "text", n = 8, minHits = 2)
      .filter(col("contaminated"))
      .select("doc_id", "n_hits")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = Decontaminate.flagContaminatedBloom(
      corpus, "doc_id", "text", bench, "text", n = 8, minHits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted contamination should flag")
    assert(bloom == exact)
  }

  test("trainShuffle: deterministic, dense per-shard positions, seed changes order") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
    val a = Shuffle.trainShuffle(df, "id", "s1", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // partition: every row exactly once, shards in range
    assert(a.map(_._1).sorted === (0L until 500L).toArray)
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    // dense 1..n positions within each shard
    for ((_, rows) <- a.groupBy(_._2))
      assert(rows.map(_._3).sorted === (1 to rows.length).toArray)
    // deterministic re-run
    val b = Shuffle.trainShuffle(df, "id", "s1", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(a.toSet == b.toSet)
    // a different seed produces a different permutation
    val c = Shuffle.trainShuffle(df, "id", "s2", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(c.toSet != a.toSet)
    // the shuffle is unbiased-ish: no shard is empty at n=500, k=8
    assert(a.groupBy(_._2).size == 8)
  }

  test("ZOrder.morton2 matches the reference bit interleave; cluster sorts by z") {
    import spark.implicits._
    def spreadRef(v0: Long): Long = {
      var v = v0 & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    val rnd = new scala.util.Random(11)
    val pts = Seq((3L, 5L), (65535L, 0L), (0L, 65535L), (12345L, 54321L)) ++
      Seq.fill(50)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton2(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for ((x, y) <- pts)
      assert(got((x, y)) == (spreadRef(x) | (spreadRef(y) << 1)), s"($x,$y)")
    // cluster: all rows kept, z non-decreasing within each partition
    val df = pts.toDF("x", "y")
    val clustered = ZOrder.cluster(df, col("x"), col("y"), numPartitions = 4)
    assert(clustered.count() == pts.length)
    val perPart = clustered
      .withColumn("z", ZOrder.morton2(col("x"), col("y")))
      .withColumn("p", spark_partition_id())
      .collect().map(r => (r.getAs[Int]("p"), r.getAs[Long]("z")))
    for ((_, zs) <- perPart.groupBy(_._1))
      assert(zs.map(_._2).toSeq == zs.map(_._2).toSeq.sorted)
  }

  test("resizeImage: real decode+scale for PGM, PNG, GIF and JPEG payloads, null for junk") {
    import spark.implicits._
    val pgm = ("P5\n4 4\n255\n").getBytes("US-ASCII") ++
      Array.tabulate[Byte](16)(i => (i * 10).toByte)
    // JPEG magic but no frame header: must degrade to null, not throw
    val notDecodable = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)
    // 4x4 GIF, 4-color palette, index pattern i%4; the LZW stream is
    // hand-packed with a CLEAR before every literal so the code width
    // stays fixed at minCode+1 (no dictionary needed)
    val gif = {
      val idx = Array.tabulate(16)(_ % 4)
      val codes = (Seq(4) ++ idx.flatMap(p => Seq(p, 4)).init :+ 5) // CLEAR p CLEAR p ... END
      val bits = new java.io.ByteArrayOutputStream()
      var cur = 0; var nb = 0
      for (c <- codes) {
        cur |= c << nb; nb += 3
        while (nb >= 8) { bits.write(cur & 0xff); cur >>= 8; nb -= 8 }
      }
      if (nb > 0) bits.write(cur & 0xff)
      val z = bits.toByteArray
      "GIF89a".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 4, 0, 0x81.toByte, 0, 0) ++               // screen + global table (4 entries)
        Array.tabulate[Byte](12)(i => ((i / 3) * 10 + i % 3).toByte) ++ // palette: idx k -> (10k,10k+1,10k+2)
        Array[Byte](0x2c, 0, 0, 0, 0, 4, 0, 4, 0, 0, 2) ++          // descriptor + minCode=2
        Array[Byte](z.length.toByte) ++ z ++ Array[Byte](0, 0x3b)
    }
    // same 4x4 gray ramp as a real PNG (filter-0 rows, deflate, CRCs)
    val png = {
      def chunk(t: String, d: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(12 + d.length)
        bb.putInt(d.length).put(t.getBytes("US-ASCII")).put(d)
        val crc = new java.util.zip.CRC32()
        crc.update(t.getBytes("US-ASCII")); crc.update(d)
        bb.putInt(crc.getValue.toInt).array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(4).putInt(4).put(8.toByte).put(0.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      val raw = Array.tabulate[Byte](4 * 5)(i =>
        if (i % 5 == 0) 0 else (((i / 5) * 4 + (i % 5) - 1) * 10).toByte)
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val z = new Array[Byte](128)
      val n = defl.deflate(z); defl.end()
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", z.take(n)) ++ chunk("IEND", Array.empty)
    }
    val kittenPath = java.nio.file.Paths.get(
      "/opt/spark/data/mllib/images/origin/kittens/DP802813.jpg")
    val jpeg: Array[Byte] =
      if (java.nio.file.Files.exists(kittenPath)) java.nio.file.Files.readAllBytes(kittenPath)
      else null
    val rows = Seq((1L, pgm), (2L, notDecodable), (3L, png), (4L, gif)) ++
      Option(jpeg).map(5L -> _)
    val df = rows.toDF("id", "payload")
    val out = Multimodal.resizeImage(df, "payload", "img", targetW = 2, targetH = 2)
      .select("id", "img").collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 3L)) {
      val img = out(id).getStruct(1)
      assert(img.getInt(0) == 2 && img.getInt(1) == 2 && img.getInt(2) == 1)
      // nearest neighbor on the 4x4 ramp: rows 0,2 cols 0,2 -> 0,20,80,100
      assert(img.getAs[Array[Byte]](3).toSeq == Seq[Byte](0, 20, 80, 100),
        s"payload $id resize mismatch")
    }
    val gifImg = out(4L).getStruct(1)
    assert(gifImg.getInt(0) == 2 && gifImg.getInt(1) == 2 && gifImg.getInt(2) == 3)
    // sampled indices at (0,0)/(0,2)/(2,0)/(2,2) are 0,2,0,2 -> palette RGB
    assert(gifImg.getAs[Array[Byte]](3).toSeq ==
      Seq[Byte](0, 1, 2, 20, 21, 22, 0, 1, 2, 20, 21, 22), "GIF resize mismatch")
    assert(out(2L).isNullAt(1), "undecodable payload must yield null, not fake pixels")
    for (r <- out.get(5L)) { // real JPEG decodes + scales through the API
      val img = r.getStruct(1)
      assert(img.getInt(0) == 2 && img.getInt(1) == 2 && img.getInt(2) == 3)
      assert(img.getAs[Array[Byte]](3).length == 12)
    }
  }

  test("curriculumOrder: threshold phases, dense in-phase positions, deterministic") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, 45.0), (3L, 80.0), (4L, 39.9), (5L, 70.0), (6L, 40.0))
      .toDF("id", "score")
    val out = Shuffle.curriculumOrder(df, "id", col("score"), Seq(40.0, 70.0), "s")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    val phases = out.map(t => t._1 -> t._2).toMap
    // boundary semantics: score >= threshold advances the phase
    assert(phases == Map(1L -> 0, 4L -> 0, 2L -> 1, 6L -> 1, 3L -> 2, 5L -> 2))
    for ((_, rows) <- out.groupBy(_._2))
      assert(rows.map(_._3).sorted === (1 to rows.length).toArray)
    // deterministic
    val again = Shuffle.curriculumOrder(df, "id", col("score"), Seq(40.0, 70.0), "s")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    assert(again.toSet == out.toSet)
    // unsorted thresholds rejected
    intercept[IllegalArgumentException] {
      Shuffle.curriculumOrder(df, "id", col("score"), Seq(70.0, 40.0), "s")
    }
  }

  test("semanticDedup: planted twins dropped within cluster, subset of global rule") {
    import spark.implicits._
    val base = emb.select(col("vec_id"), col("embedding"))
    // scaled twins: cosine exactly 1 with the original, and the same
    // point after L2 normalization => same k-means cell by construction
    val planted = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000).as("vec_id"),
        transform(col("embedding"), v => v * lit(2.0f)).as("embedding"))
    val corpus = base.unionByName(planted)
    val sd = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.99, k = 8)
    val dropped = sd.filter(col("dropped")).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    // every planted twin is dropped, justified by its original
    assert((0L until 10L).forall(i => dropped.get(i + 5000).contains(i)),
      s"dropped=$dropped")
    // nothing else dropped (no natural >=0.99 pairs in the corpus)
    assert(dropped.size == 10)
    // survivors + dropped partition the corpus
    assert(sd.count() == corpus.count())
    // gate row agrees and certifies the structural subset property
    val g = Similarity.semanticDedupGate(corpus, "vec_id", "embedding",
      threshold = 0.99, k = 8).collect()(0)
    assert(g.getLong(1) == corpus.count())
    assert(g.getLong(2) == 10 && g.getLong(3) == 10 && g.getLong(4) == 0)
  }

  test("semanticDedup hot-cell guard: split path is bit-identical and exact on a planted mega-cluster") {
    import spark.implicits._
    // 3000 copies of ONE vector (cosine exactly 1 pairwise) — the
    // web-crawl mega-cluster shape — plus the natural corpus. With
    // maxCell=128 the hot cell splits into ceil(3000/128)=24 blocks.
    val hot = spark.range(3000)
      .select((col("id") + 100000L).as("vec_id"),
        typedLit(Array.fill(8)(0.5f)).as("embedding"))
    val nat = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 8).as("embedding"))
    val corpus = nat.unionByName(hot)
    val split = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.99, k = 4, maxCell = 128)
      .collect().map(r => (r.getLong(0), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // all copies but the lowest id drop, each justified by the lowest
    val hotDrops = split.filter { case (id, _, _) => id > 100000L }
    assert(hotDrops.size == 2999 && hotDrops.forall {
      case (_, d, keep) => d && keep == 100000L }, "mega-cluster not fully deduped")
    assert(split.exists { case (id, d, _) => id == 100000L && !d })
    // the guard changes the schedule, never the result: unsplit
    // (maxCell large enough to hold the cell) must agree bit-for-bit
    val unsplit = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.99, k = 4, maxCell = 1 << 13)
      .collect().map(r => (r.getLong(0), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(split == unsplit, "hot-cell split diverged from the unsplit join")
  }

  test("semanticDedupIncremental hot-cell guard: two-sided split bit-identical") {
    import spark.implicits._
    val corpus = emb.select(col("vec_id"), slice(col("embedding"), 1, 8).as("embedding"))
      .unionByName(spark.range(600).select((col("id") + 200000L).as("vec_id"),
        typedLit(Array.fill(8)(0.25f)).as("embedding")))
    val fresh = spark.range(500)
      .select((col("id") + 900000L).as("vec_id"),
        typedLit(Array.fill(8)(0.25f)).as("embedding"))
    def run(mc: Int) = Similarity.semanticDedupIncremental(
      corpus, fresh, "vec_id", "embedding", threshold = 0.99, k = 4, maxCell = mc)
      .collect().map(r => (r.getLong(0), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val split = run(64) // both sides split: sf=ceil(500/64)=8, sc>=10
    // every fresh copy drops against the smallest corpus twin
    assert(split.count { case (_, d, k) => d && k == 200000L } == 500)
    assert(split == run(1 << 13), "two-sided split diverged from unsplit join")
  }

  test("zero-norm embeddings never count as near-duplicates (NaN cosine guard)") {
    import spark.implicits._
    // cosine(0-vec, 0-vec) = 0/0 = NaN, and Spark orders NaN above all
    // doubles — without the isnan guard `NaN >= threshold` is TRUE and
    // zero-embedding rows spuriously drop each other
    val zeros = Seq.tabulate(5)(i => (9000L + i, Array.fill(64)(0.0f)))
      .toDF("vec_id", "embedding")
    val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(zeros)
    val sd = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.99, k = 8)
    val zeroDrops = sd.filter(col("dropped") && col("id") >= 9000).count()
    assert(zeroDrops == 0, s"$zeroDrops zero-norm rows were spuriously dropped")
    assert(sd.count() == corpus.count())
    // and the pairwise operator likewise emits no zero-zero pairs
    val pairs = Similarity.nearDupPairs(corpus, "vec_id", "embedding",
      threshold = 0.9, dim = 64)
    assert(pairs.filter(col("a") >= 9000 && col("b") >= 9000).count() == 0)
  }

  test("packBins dense-id guard is lazy and fires in-plan on sparse ids") {
    import spark.implicits._
    val sparse = Seq.tabulate(50)(i => (i * 1000000L, 10L)).toDF("doc_id", "n")
    // plan CONSTRUCTION must not run a job (the guard is in-plan now):
    // no exception until an action
    val plan = Pack.packBins(sparse, "doc_id", col("n"), 100L, groupSize = 16L)
    val e = intercept[Exception] { plan.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("roughly dense ids")), s"got: ${msgs(e)}")
    // dense ids still pack fine through the in-plan guard (+0 fold)
    val dense = Seq.tabulate(50)(i => (i.toLong, 10L)).toDF("doc_id", "n")
    val out = Pack.packBins(dense, "doc_id", col("n"), 100L, groupSize = 16L)
    assert(out.count() == 50)
    assert(out.agg(max("bin")).collect()(0).getLong(0) == 4L) // 500 tokens / 100
  }

  test("BPE: paper-example merges, lossless roundtrip, deterministic, rank order") {
    // Sennrich et al. 2016 toy vocab: the first merge must be the most
    // frequent adjacent pair. vocab: low:5 lower:2 newest:6 widest:3
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.trainFromVocab(vocab, 4)
    // pair counts: (e,s)=9 (newest+widest), (s,t</w>)=9, (n,e)=6 ... —
    // (e,s) wins the (count, lexicographic) tie-break over (s,t</w>)
    assert(merges.head == ("e", "s"), s"first merge was ${merges.head}")
    assert(merges(1) == ("es", "t</w>"), s"second merge was ${merges(1)}")

    // encode honors rank order and is lossless
    val ranks = merges.zipWithIndex.toMap
    for (w <- vocab.keys) {
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString("") == w + Bpe.EndOfWord, s"$w -> $toks")
    }
    // unseen word with unseen chars still roundtrips (all-singleton)
    assert(Bpe.encodeWord("zq", ranks).mkString("") == "zq" + Bpe.EndOfWord)

    // corpus-level: train+encode on the real docs table, roundtrip all
    val merges2 = Bpe.train(docs, "text", numMerges = 20)
    assert(merges2.length == 20)
    val enc = Bpe.encode(docs.select(col("doc_id"), col("text")), "text", merges2)
    val bad = enc.select(col("text"), col("tokens"))
      .collect().filter { r =>
        val orig = graft.functions.HashExprs.tokenize(r.getString(0)).mkString(" ")
        val back = r.getSeq[String](1).mkString("").replace(Bpe.EndOfWord, " ").trim
        back != orig
      }
    assert(bad.isEmpty, s"${bad.length} docs failed roundtrip")
    // determinism
    assert(Bpe.train(docs, "text", numMerges = 20) == merges2)
  }

  test("byte-level BPE: lossless roundtrip over arbitrary UTF-8, sentinel-proof") {
    // the byte alphabet is a bijection over all 256 byte values
    assert(Bpe.ByteAlphabet.distinct.length == 256)
    assert(!Bpe.ByteAlphabet.contains(Bpe.ByteSentinel.charAt(0)))

    // property: ANY word over ANY codepoints (controls, emoji,
    // surrogate pairs, the literal char-level sentinel) encodes and
    // decodes back exactly — seeded random per the repo's test
    // discipline (no scalatestplus bridge offline)
    val rnd = new scala.util.Random(20260814L)
    def randWord(): String = {
      val sb = new java.lang.StringBuilder
      val len = 1 + rnd.nextInt(12)
      var i = 0
      while (i < len) {
        val cp = rnd.nextInt(0x110000)
        // skip the surrogate range (unpaired surrogates are not UTF-8)
        // and skip ASCII whitespace (word-internal by contract)
        if ((cp < 0xd800 || cp > 0xdfff) && !" \t\n\f\r".exists(_ == cp.toChar)) {
          sb.appendCodePoint(cp)
          i += 1
        }
      }
      sb.toString
    }
    val words = Seq.fill(300)(randWord()) ++ Seq(
      "plain", "</w>", "a</w>b", " ", "␀-adjacent␁", "🚀🚀",
      "mixé", "中文词", Bpe.ByteSentinel /* the sentinel ITSELF as input */)
    // char-level mode REJECTS sentinel-colliding words...
    assertThrows[IllegalArgumentException](
      Bpe.encodeWord("a</w>b", Map.empty))
    // ...byte-level mode encodes every one of them losslessly
    val vocab = words.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val merges = Bpe.trainBytesFromVocab(vocab, numMerges = 50)
    assert(merges.length == 50)
    val ranks = merges.zipWithIndex.toMap
    for (w <- words) {
      val toks = Bpe.encodeWordBytes(w, ranks)
      assert(toks.last.endsWith(Bpe.ByteSentinel), s"$w -> $toks")
      val back = Bpe.decodeByteTokens(toks)
      assert(back == IndexedSeq(w), s"roundtrip failed: '$w' -> $toks -> $back")
    }
    // multi-word stream decodes back word-for-word
    val stream = words.take(20).flatMap(w => Bpe.encodeWordBytes(w, ranks))
    assert(Bpe.decodeByteTokens(stream) == words.take(20).toIndexedSeq)

    // corpus-level: byte-level encode of the real docs roundtrips to
    // the exact tokenization (trainBytes determinism included)
    val bm = Bpe.trainBytes(docs, "text", numMerges = 20)
    assert(Bpe.trainBytes(docs, "text", numMerges = 20) == bm)
    val enc = Bpe.encodeBytes(docs.select(col("doc_id"), col("text")), "text", bm)
    val bad = enc.select(col("text"), col("tokens"))
      .collect().filter { r =>
        val orig = graft.functions.HashExprs.tokenize(r.getString(0)).toIndexedSeq
        Bpe.decodeByteTokens(r.getSeq[String](1)) != orig
      }
    assert(bad.isEmpty, s"${bad.length} docs failed byte-level roundtrip")
  }

  test("PQ: codes in range, deterministic; reranked recall beats raw ADC") {
    val base = emb.select(col("vec_id"), col("embedding"))
    val books = Similarity.pqTrain(base, "embedding", dim = 64, m = 8, ksub = 32)
    assert(books.centroids.length == 8 &&
      books.centroids.forall(_.length == 32) && books.dsub == 8)
    val codes = Similarity.pqEncode(base, "vec_id", "embedding", books)
    val rows = codes.collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(rows.forall { case (_, cs) => cs.length == 8 && cs.forall(c => c >= 0 && c < 32) })
    // deterministic re-train + re-encode
    val books2 = Similarity.pqTrain(base, "embedding", dim = 64, m = 8, ksub = 32)
    val rows2 = Similarity.pqEncode(base, "vec_id", "embedding", books2)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(rows.toMap == rows2.toMap)

    val q = base.filter(col("vec_id") < 10)
    def recall(topk: org.apache.spark.sql.DataFrame): Double = {
      val brute = Similarity.bruteForceTopK(base, q, "vec_id", "embedding", 5)
        .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = topk.select("q_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.intersect(got).size.toDouble / brute.size
    }
    val raw = recall(Similarity.pqTopK(codes, q, "vec_id", "embedding", books, 5))
    val rr = recall(Similarity.pqTopKReranked(base, codes, q, "vec_id", "embedding",
      books, 5, shortlist = 50))
    assert(rr >= raw, s"rerank ($rr) should not lose to raw ADC ($raw)")
    assert(rr >= 0.5, s"reranked recall $rr below floor")
  }

  test("IVF-PQ: probe-bounded ADC, codes in range, deterministic, reranked recall") {
    val base = emb.select(col("vec_id"), col("embedding"))
    val ix = Similarity.ivfPqTrain(base, "embedding", dim = 64, nlist = 8, m = 8, ksub = 32)
    assert(ix.coarse.length == 8 && ix.books.centroids.length == 8 && ix.books.dsub == 8)
    val codes = Similarity.ivfPqEncode(base, "vec_id", "embedding", ix)
    val rows = codes.collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    assert(rows.forall { case (_, cell, cs) =>
      cell >= 0 && cell < 8 && cs.length == 8 && cs.forall(c => c >= 0 && c < 32) })
    // deterministic re-train + re-encode
    val ix2 = Similarity.ivfPqTrain(base, "embedding", dim = 64, nlist = 8, m = 8, ksub = 32)
    val rows2 = Similarity.ivfPqEncode(base, "vec_id", "embedding", ix2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    assert(rows.toSet == rows2.toSet)

    val q = base.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(base, q, "vec_id", "embedding", 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(topk: org.apache.spark.sql.DataFrame): Double = {
      val got = topk.select("q_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.intersect(got).size.toDouble / brute.size
    }
    // full probe = IndexPQ-grade recall; the rerank removes ADC error
    val rr = recall(Similarity.ivfPqTopKReranked(base, codes, q, "vec_id", "embedding",
      ix, k = 5, shortlist = 50, nprobe = 8))
    assert(rr >= 0.5, s"IVFADC reranked recall $rr below floor")
    // probe-bounded: nprobe < nlist still finds most neighbors
    val partial = recall(Similarity.ivfPqTopKReranked(base, codes, q, "vec_id", "embedding",
      ix, k = 5, shortlist = 50, nprobe = 4))
    assert(partial >= 0.4, s"nprobe=4 recall $partial collapsed")
    // plan shape: candidates come from an equi-join on cell against the
    // broadcast probe list — never a cartesian/NLJ over the codes
    val plan = Similarity.ivfPqTopK(codes, q, "vec_id", "embedding", ix, 5, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"unbounded scan in IVFADC plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"probe join not broadcast:\n$plan")
  }

  test("batch IVFADC == broadcast IVFADC bit-for-bit; no per-query broadcast join") {
    val base = emb.select(col("vec_id"), col("embedding"))
    val ix = Similarity.ivfPqTrain(base, "embedding", dim = 64, nlist = 8, m = 8, ksub = 32)
    val codes = Similarity.ivfPqEncode(base, "vec_id", "embedding", ix)
    // the batch shape: the query set IS the corpus (100% — beyond the
    // >=10% bar), so the per-query LUT broadcast of ivfPqTopK would
    // scale with N; the batch path must reproduce it exactly anyway
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val ref = key(Similarity.ivfPqTopK(codes, base, "vec_id", "embedding", ix, 5, 4))
    val bat = key(Similarity.ivfPqTopKBatch(codes, base, "vec_id", "embedding", ix, 5, 4))
    assert(bat == ref, s"batch/broadcast mismatch: ${bat.diff(ref)} vs ${ref.diff(bat)}")
    // reranked variant agrees too (exact cosine removes ADC rounding)
    val refR = key(Similarity.ivfPqTopKReranked(base, codes, base, "vec_id", "embedding",
      ix, k = 5, shortlist = 50, nprobe = 8))
    val batR = key(Similarity.ivfPqTopKBatchReranked(base, codes, base, "vec_id", "embedding",
      ix, k = 5, shortlist = 50, nprobe = 8))
    assert(batR == refR)
    // hot-cell guard: forcing maxQueriesPerCell far below the ~Q*nprobe/nlist
    // per-cell probe load splits every cell into id-hash query blocks —
    // results must stay bit-identical (each (query, cell) pair scored in
    // exactly one block task against ALL the cell's codes) while the
    // executed cogroup-task count rises above the nlist=8 ceiling
    val split = key(Similarity.ivfPqTopKBatch(codes, base, "vec_id", "embedding", ix, 5, 4,
      maxQueriesPerCell = 16))
    val groups = Similarity.lastBatchGroups.value
    assert(split == ref, s"forced-split batch diverged: ${split.diff(ref)} vs ${ref.diff(split)}")
    assert(groups > 8, s"hot-cell split did not lift parallelism past nlist: $groups groups")
    // plan shape: candidates come from the cell-keyed cogroup; the only
    // broadcasts are of the <= nlist-row per-cell split-factor aggregate
    // — nothing broadcast scales with the query set, no product anywhere
    val plan = Similarity.ivfPqTopKBatch(codes, base, "vec_id", "embedding", ix, 5, 4)
      .queryExecution.executedPlan.toString
    // round-20: the cogroup is hand-rolled (union + user-pinned
    // repartition on (cell, __blk) + sortWithinPartitions +
    // mapPartitions walk) so AQE cannot byte-coalesce the compute-dense
    // scoring pass to one task; the pin follows the new physical shape
    // while keeping every no-product / broadcast-scaling assertion below
    assert(plan.contains("MapPartitions"), s"expected cell-keyed group walk:\n$plan")
    assert("Exchange hashpartitioning\\(cell#\\d+, __blk#\\d+, \\d+\\), REPARTITION_BY_NUM".r
        .findFirstIn(plan).isDefined,
      s"expected the user-pinned (cell, __blk) exchange:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"product leaked into batch IVFADC plan:\n$plan")
    val bhj = "BroadcastHashJoin \\[(\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(bhj.forall(_ == "cell"),
      s"a broadcast join not keyed on cell (per-query broadcast?) leaked in: $bhj\n$plan")
  }

  test("semanticDedupIncremental: twins dropped vs corpus, novel kept, stable cells") {
    import spark.implicits._
    val base = emb.select(col("vec_id"), col("embedding"))
    val twins = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000).as("vec_id"),
        transform(col("embedding"), v => v * lit(3.0f)).as("embedding"))
    val novel = base.filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .select((col("vec_id") + 6000).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    val fresh = twins.unionByName(novel)
    val out = Similarity.semanticDedupIncremental(
      base, fresh, "vec_id", "embedding", threshold = 0.99, k = 8)
      .collect().map(r => (r.getLong(0), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // every twin dropped, justified by its original; every novel kept
    assert((0L until 10L).forall(i => out.contains((i + 5000, true, i))), s"out=$out")
    assert((10L until 20L).forall(i => out.contains((i + 6000, false, -1L))), s"out=$out")
    assert(out.length == 20)
    // frozen quantizer: a re-run assigns identical cells (the ingest
    // stability property — cluster ids must not reshuffle per batch)
    val cells1 = Similarity.semanticDedupIncremental(
      base, fresh, "vec_id", "embedding", threshold = 0.99, k = 8)
      .select("id", "cluster").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val cells2 = Similarity.semanticDedupIncremental(
      base, fresh, "vec_id", "embedding", threshold = 0.99, k = 8)
      .select("id", "cluster").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(cells1 == cells2)
  }

  test("randomProject: JL norm concentration, pairwise preservation, layout determinism") {
    val out = Similarity.randomProject(emb, "embedding", "proj", 64, 8, 7L)
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("proj"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray))
    assert(out.nonEmpty && out.forall(_._3.length == 8))
    def sq(a: Array[Double]) = a.map(v => v * v).sum
    // E[||Pv||^2] = outDim * ||v||^2 for gaussian planes: the MEAN
    // ratio over vectors concentrates near 8 (individual ratios are
    // chi^2_8-spread)
    val ratios = out.map { case (_, v, p) => sq(p) / sq(v) }
    val mean = ratios.sum / ratios.length
    assert(mean > 5.0 && mean < 11.0, s"norm ratio mean $mean escaped [5, 11]")
    // pairwise distances preserve in the same sense
    val pairs = out.take(40).combinations(2).take(200).map { case Array(a, b) =>
      val dOrig = sq(a._2.zip(b._2).map { case (x, y) => x - y })
      val dProj = sq(a._3.zip(b._3).map { case (x, y) => x - y })
      dProj / dOrig
    }.toArray
    val pMean = pairs.sum / pairs.length
    assert(pMean > 5.0 && pMean < 11.0, s"pairwise ratio mean $pMean escaped [5, 11]")
    // determinism: same seed + different layout => identical doubles
    val again = Similarity.randomProject(emb.repartition(5), "embedding", "proj", 64, 8, 7L)
      .select(col("vec_id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    for ((id, _, p) <- out) assert(p.toSeq == again(id).toSeq, s"vec $id drifted")
    // a different seed is a different projection
    val other = Similarity.randomProject(emb, "embedding", "proj", 64, 8, 8L)
      .select(col("proj")).limit(1).collect().head.getSeq[Double](0)
    assert(other.toSeq != out.head._3.toSeq)
  }

  test("centroidClassify: above-chance accuracy, label-domain preds, margin floor, layout-stable") {
    val out = Similarity.centroidClassify(emb, "vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val labels = out.map(_._2).toSet
    assert(out.nonEmpty && out.forall(r => labels.contains(r._3)),
      "a prediction left the label domain")
    val acc = out.count(r => r._2 == r._3).toDouble / out.length
    assert(acc > 2.0 / labels.size,
      s"centroid probe no better than 2x chance: $acc over ${labels.size} labels")
    // determinism under a different physical layout (the centroid
    // aggregation and the assignment must be pure functions of values)
    val out2 = Similarity.centroidClassify(
        emb.repartition(7, col("vec_id")), "vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
    // the oracle's exact-match contract rests on the best-vs-runner-up
    // cosine margin dwarfing cross-engine f64 ulp drift — recompute
    // margins independently and pin the floor
    val vecs = emb.select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val cents = vecs.groupBy(_._2).map { case (l, vs) =>
      l -> Array.tabulate(vs.head._3.length)(j => vs.map(_._3(j)).sum / vs.length)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(j => a(j) * b(j)).sum
      val na = math.sqrt(a.map(v => v * v).sum)
      val nb = math.sqrt(b.map(v => v * v).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    var minMargin = Double.MaxValue
    for ((_, _, v) <- vecs) {
      val sims = cents.values.map(c => cos(v, c)).toArray.sorted
      minMargin = math.min(minMargin, sims(sims.length - 1) - sims(sims.length - 2))
    }
    assert(minMargin > 1e-6, s"assignment margin floor violated: $minMargin")
    // ragged centroid dims are rejected at broadcast time, before any
    // executor-side dot loop could read out of bounds
    val ragged = intercept[IllegalArgumentException](
      Similarity.assignByCentroids(spark,
        Array(0 -> Array(1.0, 2.0), 1 -> Array(1.0, 2.0, 3.0))))
    assert(ragged.getMessage.contains("ragged"), ragged.getMessage)
  }

  test("model quality filter: runner-up logit gap dwarfs f32 drift; no NaN logits") {
    val bc = spark.sparkContext.broadcast(graft.SparkEntry.qualityModel)
    val feats = docs.select(col("doc_id"), graft.SparkEntry.qualityFeatures.as("feat"))
    val logits = graft.torch.Torch.inferBatched(feats, "feat", "logits", bc, batchSize = 64)
      .select("logits").collect().map(_.getSeq[Float](0).toArray)
    assert(logits.nonEmpty && logits.forall(l => l.length == 3 && l.forall(v => !v.isNaN)))
    // the argmax the oracle pins is only meaningful if the runner-up
    // gap clears the f32-vs-f64 forward drift (measured 4e-5) with room
    val gaps = logits.map { l => val s = l.sorted; s(2) - s(1) }
    assert(gaps.min > 1e-3, s"min runner-up gap ${gaps.min} too close to f32 drift")
  }

  test("q107 embedding classifier: mixed classes, runner-up gap dwarfs f32 drift") {
    val out = graft.SparkEntry.queries("q107_torch_embedding")(spark, sfDir)
      .collect().map(_.getInt(1))
    assert(out.toSet.size >= 2, s"constant class column: ${out.toSet}")
    val m = graft.SparkEntry.embedClassModel
    val vocab = m.embedHead.get.vocab
    val bc = spark.sparkContext.broadcast(m)
    val toks = docs.select(col("doc_id"),
      transform(
        call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
        tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab).as("tok_ids"))
    val logits = graft.torch.Torch.inferBatched(toks, "tok_ids", "logits", bc, 64)
      .select("logits").collect().map(_.getSeq[Float](0).toArray)
    assert(logits.forall(l => l.length == 3 && l.forall(v => !v.isNaN)))
    val gaps = logits.map { l => val s = l.sorted; s(2) - s(1) }
    assert(gaps.min > 1e-3, s"min runner-up gap ${gaps.min} too close to f32 drift")
  }

  test("q113 TextCNN: mixed classes; dyadic weights make f32 forward EXACTLY equal f64") {
    val out = graft.SparkEntry.queries("q113_torch_textcnn")(spark, sfDir)
      .collect().map(_.getInt(1))
    assert(out.toSet.size >= 2, s"constant class column: ${out.toSet}")
    val m = graft.SparkEntry.textCnnModel
    // the oracle-soundness invariant: every weight sits on the 1/16
    // grid within the magnitude bound that keeps ALL forward-pass
    // intermediates inside the f32 24-bit mantissa (see textCnnModel) —
    // so the engine's f32 math and DuckDB's f64 math are bit-identical
    def dyadic(w: Array[Float], bound: Double): Unit = w.foreach { v =>
      assert(v * 16 == math.rint(v * 16) && math.abs(v) <= bound, s"off-grid weight $v")
    }
    val e = m.seqHead.get
    val cv = m.ops.collectFirst { case c: graft.torch.Conv1dOp => c }.get
    val fc = m.layers.last
    dyadic(e.weight, 2.0); dyadic(cv.weight, 2.0); dyadic(cv.bias, 0.5)
    dyadic(fc.weight, 4.0); dyadic(fc.bias, 8.0)
    // exactness witness: independent f64 forward on real docs must
    // EQUAL (not approximate) the engine's f32 logits
    val vocab = e.vocab
    val toks = docs.select(col("doc_id"),
      transform(
        call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
        tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab).as("tok_ids"))
      .filter(size(col("tok_ids")) >= 2)
    val bc = spark.sparkContext.broadcast(m)
    val rows = graft.torch.Torch.inferBatched(toks, "tok_ids", "logits", bc, 64)
      .select("tok_ids", "logits").limit(64).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val ids = r.getSeq[Int](0).toArray
      val got = r.getSeq[Float](1).toArray.map(_.toDouble)
      val x = Array.tabulate(e.embDim)(d => ids.map(t => e.weight(t * e.embDim + d).toDouble))
      val l = ids.length
      val convOut = Array.tabulate(cv.outCh) { c =>
        Array.tabulate(l - cv.k + 1) { p =>
          var acc = cv.bias(c).toDouble
          for (d <- 0 until cv.inCh; j <- 0 until cv.k)
            acc += cv.weight((c * cv.inCh + d) * cv.k + j) * x(d)(p + j)
          math.max(0.0, acc)
        }.max
      }
      val want = Array.tabulate(3) { o =>
        var acc = fc.bias(o).toDouble
        for (c <- 0 until cv.outCh) acc += fc.weight(o * cv.outCh + c) * convOut(c)
        acc
      }
      assert(got.sameElements(want), s"f32 ${got.toSeq} != f64 ${want.toSeq}")
    }
  }

  test("spark.graft.checkpoint.dir switches to reliable checkpoints, same results") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("a", "b")
    val local = Components.connectedComponents(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      val reliable = Components.connectedComponents(edges, "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(reliable == local)
      // the reliable path actually wrote checkpoint data to the dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
      // setCheckpointDir is called once per CONFIGURED dir, not once
      // per cp() call: a CC run makes many checkpoints, and each
      // setCheckpointDir would mkdir a fresh UUID subdirectory (FS
      // round trips + directory churn on HDFS/S3). One UUID dir total.
      val uuidDirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isDirectory(_)).count()
      assert(uuidDirs == 1, s"expected 1 UUID checkpoint subdir, got $uuidDirs")
    } finally spark.conf.unset(Checkpoints.DirKey)
  }

  test("spanCorrupt: strings equal an independent T5-noising recompute; sentinels number spans; empty doc clean") {
    import spark.implicits._
    def bucket(id: Long, pos: Int): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}_$pos".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100 < 15
    }
    def reference(id: Long, toks: Seq[String]): (Int, Int, String, String) = {
      var (inp, tgt) = (Vector.empty[String], Vector.empty[String])
      var k = 0; var nm = 0; var prev = false
      for ((tk, i) <- toks.zipWithIndex) {
        val m = bucket(id, i + 1)
        if (m && !prev) { inp :+= s"<extra_id_$k>"; tgt :+= s"<extra_id_$k>"; tgt :+= tk; k += 1 }
        else if (m) tgt :+= tk
        else inp :+= tk
        if (m) nm += 1
        prev = m
      }
      (nm, k, inp.mkString(" "), tgt.mkString(" "))
    }
    val docs = Seq(
      (7L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (8L, (1 to 40).map(i => s"v$i").mkString(" ")),
      (9L, ""))
      .toDF("doc_id", "text")
    val out = Noise.spanCorrupt(docs, "doc_id", "text", ratePct = 15)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4), r.getString(5)))).toMap
    for (id <- Seq(7L, 8L)) {
      val toks = (1 to 40).map(i => if (id == 7L) s"w$i" else s"v$i")
      val (nm, k, inp, tgt) = reference(id, toks)
      assert(out(id) == ((40, nm, k, inp, tgt)), s"doc $id:\n${out(id)}\nvs\n($nm,$k,$inp,$tgt)")
      assert(nm > 0 && k > 0, s"fixture doc $id masked nothing — pick other ids")
    }
    assert(out(9L) == ((0, 0, 0, "", "")))
  }

  test("bleu2: identity 1.0, disjoint 0.0, hand-computed clipped case, short-candidate nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d", "a b c d"),            // identity
      (2L, "x y z", "a b c"),                // disjoint -> 0
      // cand: "the the cat" vs ref "the cat sat": clip1 = min(2,1)+1 = 2,
      // len1 = 3 -> p1 = 2/3; bigrams cand {the the, the cat}, ref
      // {the cat, cat sat}: clip2 = 1, len2 = 2 -> p2 = 1/2;
      // len1 == rlen -> BP = 1; bleu = exp((ln(2/3)+ln(1/2))/2)
      (3L, "the the cat", "the cat sat"),
      (4L, "a", "a b")                       // 1 token: p2/bleu NULL
    ).toDF("k", "cand", "ref")
    val out = Eval.bleu2(df, "k", "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(out(1L) == ((Some(1.0), Some(1.0), Some(1.0))))
    assert(out(2L) == ((Some(0.0), Some(0.0), Some(0.0))))
    val exp3 = BigDecimal(math.exp((math.log(2.0 / 3.0) + math.log(0.5)) / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(3L)._1 == Some(0.666667) && out(3L)._2 == Some(0.5)
      && out(3L)._3 == Some(exp3), out(3L).toString)
    assert(out(4L)._2.isEmpty && out(4L)._3.isEmpty)
  }

  test("rouge2: identity 1.0; extra candidate content never lowers recall; masked-fraction identity") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c", "a b c"),              // identity
      (2L, "a b c x y z", "a b c"),        // superset cand -> still 1.0
      (3L, "a <extra_id_0> d", "a b c d")  // 2 of 4 unigrams survive
    ).toDF("k", "cand", "ref")
    val out = Eval.rouge2(df, "k", "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), Option(r.get(3))))).toMap
    assert(out(1L) == ((3L, 1.0, Some(1.0))))
    assert(out(2L)._2 == 1.0 && out(2L)._3 == Some(1.0))
    assert(out(3L)._1 == 4L && out(3L)._2 == 0.5)
    // the q201 identity: unigram recall == unmasked fraction, because
    // sentinels never collide with corpus tokens
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corr = Noise.spanCorrupt(docs, "doc_id", "text", ratePct = 15)
    val pairs = corr.select(col("doc_id"), col("corrupted"),
        col("n_tokens"), col("n_masked"))
      .join(docs.select(col("doc_id"), col("text").as("ref")), "doc_id")
    val joined = Eval.rouge2(pairs, "doc_id", "corrupted", "ref")
      .join(pairs.select("doc_id", "n_tokens", "n_masked"), "doc_id")
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("r1"),
        round((col("n_tokens") - col("n_masked")).cast("double")
          / col("n_tokens").cast("double"), 6).as("unmasked"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
      s"doc ${r.getLong(0)}: r1 ${r.getDouble(1)} != unmasked ${r.getDouble(2)}"))
  }

  test("corpusDiff: added/removed/changed/unchanged classified exactly; bodies never join") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("doc_id", "text")
    val out = Versioning.corpusDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    val all = Versioning.corpusDiff(v1, v2, "doc_id", "text", keepUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) == "unchanged" && all.size == 4)
    // the join carries fingerprints, not text (the bodies are pruned
    // before the exchange — md5 itself may constant-fold on a local
    // fixture, but the joined columns must be the fp_ pair)
    val plan = Versioning.corpusDiff(v1, v2, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("fp_old") && !plan.contains("text#"), plan)
  }

  test("sft renderTurns: spans address the exact assistant substrings; roles alternate; empty doc clean") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")), // 3 turns: u(1-8), a(9-16), u(17-20)
      (2L, "solo"),                                    // 1 user turn, no mask
      (3L, "")).toDF("doc_id", "text")
    val out = Sft.renderTurns(docs, "doc_id", "text", turnTokens = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    val (nt1, nm1, rnd1, sp1) = out(1L)
    assert(nt1 == 3)
    val expRendered = "<|user|> " + (1 to 8).map(i => s"w$i").mkString(" ") +
      " <|assistant|> " + (9 to 16).map(i => s"w$i").mkString(" ") +
      " <|user|> " + (17 to 20).map(i => s"w$i").mkString(" ")
    assert(rnd1 == expRendered, s"\n$rnd1\nvs\n$expRendered")
    // every span substring must equal the assistant turn's content
    val spans = sp1.split(",").map { se =>
      val Array(a, b) = se.split(":"); (a.toInt, b.toInt)
    }
    assert(spans.length == 1)
    val (st, en) = spans.head
    assert(rnd1.substring(st, en) == (9 to 16).map(i => s"w$i").mkString(" "))
    assert(nm1 == (en - st).toLong)
    assert(out(2L) == ((1, 0L, "<|user|> solo", "")))
    assert(out(3L) == ((0, 0L, "", "")))
  }

  test("mmrRerank: duplicates demote, step 1 = top relevance, lambda=1 reduces to pure relevance") {
    import spark.implicits._
    // query at e0; candidates: two IDENTICAL near-query vectors (10, 11),
    // one relevant-but-diverse (12: cos 0.6 to q, ~0.52 to 10), one anti (13)
    def v(parts: (Int, Double)*): Seq[Float] = {
      val a = Array.fill(4)(0.0f); parts.foreach { case (i, x) => a(i) = x.toFloat }; a.toSeq
    }
    val corpus = Seq(
      (10L, v(0 -> 1.0, 1 -> 0.1)),
      (11L, v(0 -> 1.0, 1 -> 0.1)),  // exact duplicate of 10
      (12L, v(0 -> 0.6, 1 -> -0.8)),
      (13L, v(0 -> -1.0))).toDF("vec_id", "embedding")
    val q = Seq((0L, v(0 -> 1.0))).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(corpus, q, "vec_id", "embedding", k = 3, fetch = 4)
      .orderBy("mmr_rank").collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    // rank1 = most relevant smaller id (10); rank2 must SKIP the
    // duplicate 11 (sim 1.0 halves its score: 0.5·0.995−0.5 ≈ −0.0025,
    // below 12's 0.3 − 0.5·0.517 ≈ 0.041); rank3 takes the duplicate
    // back over the anti-correlated 13
    assert(out.map(_._2) == Seq(10L, 12L, 11L), out.toString)
    // lambda=1: pure relevance order = bruteForceTopK order
    val pure = Similarity.mmrRerank(corpus, q, "vec_id", "embedding",
        k = 3, fetch = 4, lam = 1.0)
      .orderBy("mmr_rank").collect().map(_.getLong(2)).toSeq
    val bf = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(pure == bf, s"$pure vs $bf")
  }

  test("charEntropy: analytic cases exact, matches an independent histogram recompute, empty clean") {
    import spark.implicits._
    def ref(s: String): Double = {
      if (s.isEmpty) 0.0
      else {
        val counts = s.toSeq.groupBy(identity).map(_._2.size.toDouble)
        val n = s.length.toDouble
        (StrictMath.log(n) - counts.map(k => k * StrictMath.log(k)).sum / n) /
          StrictMath.log(2.0)
      }
    }
    val docs = Seq("aaaa", "abab", "abcd", "", "mixed text with spaces\nand 的 unicode",
      "aabbbcccc").zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), TextOps.charEntropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) == 0.0)                       // single symbol
    assert(math.abs(got(1L) - 1.0) < 1e-12)      // two equiprobable
    assert(math.abs(got(2L) - 2.0) < 1e-12)      // four equiprobable
    assert(got(3L) == 0.0)                       // empty
    val texts = Seq("aaaa", "abab", "abcd", "", "mixed text with spaces\nand 的 unicode",
      "aabbbcccc")
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(math.abs(got(i.toLong) - ref(t)) < 1e-9, s"doc $i: ${got(i.toLong)} vs ${ref(t)}")
    }
  }

  test("CMS sketch: never undercounts, exact on a collision-free fixture, partition-invariant merge") {
    import spark.implicits._
    // 30 distinct grams, gram g_i appears in i+1 docs
    val docs = (0 until 30).flatMap(i => (0 to i).map(d => (i.toLong * 100 + d,
      Seq(s"g$i")))).toDF("doc_id", "grams")
    val (depth, width) = (4, 1024)
    def sketch(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.agg(Profile.Cms.cms_sketch(col("grams"), depth, width).as("sk"))
        .selectExpr("sk.counters").head().getSeq[Long](0).toArray
    val c1 = sketch(docs.coalesce(1))
    val c32 = sketch(docs.repartition(32))
    assert(c1.toSeq == c32.toSeq, "merge is not partition-invariant")
    // exact counts recoverable (min over rows kills the few collisions
    // 30 grams can make in 1024 buckets only if some pair collides in
    // ALL 4 rows — probability ~(30·29/2)·1024^-4; never undercount
    // holds unconditionally)
    (0 until 30).foreach { i =>
      val est = Profile.Cms.estimate(c1, depth, width, s"g$i")
      assert(est >= i + 1, s"undercount for g$i: $est < ${i + 1}")
      assert(est == i + 1, s"4-deep collision for g$i (astronomically unlikely): $est")
    }
    // duplicate grams inside one row count each occurrence
    val dup = Seq((1L, Seq("x", "x", "y"))).toDF("doc_id", "grams")
    val cd = sketch(dup)
    assert(Profile.Cms.estimate(cd, depth, width, "x") == 2L)
    assert(Profile.Cms.estimate(cd, depth, width, "y") == 1L)
  }

  test("fimTransform: PSM segments reassemble to the original; cuts bounded; plain passthrough; empty doc clean") {
    import spark.implicits._
    def b(id: Long, tag: String, mod: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}_$tag".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % mod
    }
    val docs = ((0L until 60L).map(i =>
        (i, (1 to 30).map(j => s"t${i}_$j").mkString(" "))) :+ (99L, ""))
      .toDF("doc_id", "text")
    val out = Noise.fimTransform(docs, "doc_id", "text", fimPct = 50)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getString(5)))).toMap
    var psmSeen = 0
    for (id <- 0L until 60L) {
      val toks = (1 to 30).map(j => s"t${id}_$j")
      val (n, mode, lo, hi, s) = out(id)
      assert(n == 30)
      if (b(id, "fim", 100) < 50) {
        psmSeen += 1
        val (c1, c2) = (b(id, "cut1", 31), b(id, "cut2", 31))
        val (elo, ehi) = (math.min(c1, c2), math.max(c1, c2))
        assert(mode == "psm" && lo.contains(elo) && hi.contains(ehi))
        // parse the PSM layout back out and reassemble in document order
        val m = "(?s)<PRE> (.*) <SUF> (.*) <MID> (.*)".r
        val m(pre, suf, mid) = s
        val reassembled = Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
        assert(reassembled == toks.mkString(" "), s"doc $id reassembly")
      } else {
        assert(mode == "plain" && lo.isEmpty && hi.isEmpty && s == toks.mkString(" "))
      }
    }
    assert(psmSeen > 10 && psmSeen < 50, s"degenerate gate split: $psmSeen")
    val (n9, mode9, _, _, s9) = out(99L)
    assert(n9 == 0 && (mode9 == "plain" || s9 == "<PRE>  <SUF>  <MID> "))
  }

  test("randomProject GEMM path (planes past the literal cap) is bit-identical to the literal HOF chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{aggregate => aggr, _}
    val dim = 64; val outDim = 65 // 4160 > LiteralPlaneCap -> GEMM path
    assert(dim.toLong * outDim > Similarity.LiteralPlaneCap)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Seq.tabulate(dim)(j => math.sin(i * 37 + j * 13.7))))
      .toDF("vec_id", "embedding")
    val gemm = Similarity.randomProject(vecs, "embedding", "p", dim, outDim)
      .select("vec_id", "p").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // the literal HOF chain over the SAME planes, built inline
    val ps = Similarity.jlPlanes(dim, outDim, 42L)
    val litProj = array(ps.map { p =>
      aggr(zip_with(col("embedding"), typedLit(p.toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    }: _*)
    val hof = vecs.select(col("vec_id"), litProj.as("p")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, v) <- gemm) assert(v == hof(id), s"vec $id differs")
  }

  test("epochUpsample: integer epochs exact, fractional epochs hit the bucket rate, e<1 downsamples") {
    import spark.implicits._
    val docs = (0L until 4000L).map(i =>
      (i, if (i % 4 == 0) "a" else if (i % 4 == 1) "b" else if (i % 4 == 2) "c" else "d"))
      .toDF("doc_id", "source")
    val out = Mix.epochUpsample(docs, "source", "doc_id",
        Map("a" -> 2.0, "b" -> 2.5, "c" -> 0.5))
      .groupBy("source").agg(sum("n_copies").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // integer epochs: EXACT multiple, no hash noise
    assert(out("a") == ((2000L, 1000L)))
    // default stratum: exactly 1 copy each
    assert(out("d") == ((1000L, 1000L)))
    // fractional: within ~6% of the expected rate (md5 buckets)
    assert(math.abs(out("b")._1 - 2500L) < 150, out("b").toString)
    assert(math.abs(out("c")._1 - 500L) < 150, out("c").toString)
    // determinism: same inputs -> same copies
    val again = Mix.epochUpsample(docs, "source", "doc_id", Map("b" -> 2.5))
      .agg(sum("n_copies")).first().getLong(0)
    val again2 = Mix.epochUpsample(docs, "source", "doc_id", Map("b" -> 2.5))
      .agg(sum("n_copies")).first().getLong(0)
    assert(again == again2)
  }

  test("packedBoundaries: starts are exact cumulative offsets, consistent with packBins membership") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j"),
      (5L, "k l m n o"), (6L, "p q"))
      .toDF("doc_id", "text")
    val out = Pack.packedBoundaries(docs, "doc_id",
        TextOps.tokenCount(col("text")), capacity = 6L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3), r.getSeq[Long](4)))
    val bins = Pack.packBins(docs, "doc_id", TextOps.tokenCount(col("text")), 6L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byBin = bins.groupBy(_._3)
    assert(out.map(_._1).toSet == byBin.keySet)
    for ((bin, nDocs, seqLen, ids, starts) <- out) {
      val members = byBin(bin).sortBy(_._1)
      assert(ids == members.map(_._1).toSeq, s"bin $bin members")
      assert(nDocs == members.length && seqLen == members.map(_._2.toLong).sum)
      // starts = exact prefix sums of member lengths, from 0
      val expect = members.map(_._2.toLong).scanLeft(0L)(_ + _).init
      assert(starts == expect.toSeq, s"bin $bin starts $starts vs $expect")
    }
  }

  test("hardNegatives: never the query's own label; an identical different-label vector ranks 1") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0), 0),
      (2L, Seq(1.0, 0.0, 0.0), 1), // identical to q1 but other label -> rank 1
      (3L, Seq(0.9, 0.1, 0.0), 0), // same label: excluded however close
      (4L, Seq(0.0, 1.0, 0.0), 1),
      (5L, Seq(0.0, 0.0, 1.0), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(corpus,
        corpus.filter(col("vec_id") === 1L), "vec_id", "embedding", "label", k = 3)
      .collect().map(r => (r.getInt(2), r.getLong(3), r.getInt(4)))
    assert(out.forall(_._3 != 0), s"a negative shares the query label: ${out.toSeq}")
    assert(out.head == ((1, 2L, 1)), s"rank 1 should be the identical vec 2: ${out.toSeq}")
    assert(out.map(_._2).toSet == Set(2L, 4L, 5L))
  }

  test("dedupClustersBy: survivor is the best-scoring member, exactly one per cluster, singletons survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, 120L), (2L, 300L), (3L, 300L), // cluster {1,2,3}: 2 wins (score tie 2/3 -> id)
      (4L, 50L), (5L, 80L),               // cluster {4,5}: 5 wins
      (6L, 10L))                          // singleton
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val out = Components.dedupClustersBy(docs, "doc_id", pairs, col("n_chars"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(2L)._2 && !out(1L)._2 && !out(3L)._2)
    assert(out(5L)._2 && !out(4L)._2)
    assert(out(6L)._2 && out(6L)._1 == 6L)
    // one survivor per cluster
    val perCluster = out.values.groupBy(_._1).map { case (c, vs) => c -> vs.count(_._2) }
    assert(perCluster.values.forall(_ == 1), perCluster.toString)
  }

  test("canonicalUrl: the six rules, hand cases + idempotence") {
    import spark.implicits._
    val cases = Seq(
      // fragment dropped; scheme+host lowered; path case KEPT
      ("HTTPS://Example.COM/Article/One#frag", "https://example.com/Article/One"),
      // www and :80 stripped
      ("http://WWW.site.org:80/a", "http://site.org/a"),
      // utm_* params dropped, others kept in order; separators repaired
      ("https://s.io/p?utm_source=x&id=7&utm_campaign=y&z=1", "https://s.io/p?id=7&z=1"),
      // all params tracking -> query gone entirely
      ("https://s.io/p?utm_a=1&utm_b=2", "https://s.io/p"),
      // trailing slash stripped (one)
      ("https://s.io/dir/", "https://s.io/dir"),
      // query without path keeps working
      ("https://s.io?id=1", "https://s.io?id=1"),
      // host-only
      ("https://WWW.S.IO", "https://s.io"))
    val out = cases.map(_._1).toDF("u")
      .select(TextOps.canonicalUrl(col("u")).as("c")).collect().map(_.getString(0))
    for (((_, want), got) <- cases.zip(out))
      assert(got == want, s"got $got, want $want")
    // idempotence: canonical of canonical is the identity
    val twice = out.toSeq.toDF("u")
      .select(TextOps.canonicalUrl(col("u")).as("c")).collect().map(_.getString(0))
    assert(twice.toSeq == out.toSeq, s"not idempotent: ${twice.toSeq} vs ${out.toSeq}")
  }

  test("Kneser-Ney bigram: hand-derived doc score; full-vocab probabilities sum to 1 per context") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "b a b"),
      (3L, "c"))       // zero bigrams
      .toDF("doc_id", "text")
    val out = LmScore.knBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    // corpus bigram occurrences: doc1 = (a b), (b a), (a c); doc2 =
    // (b a), (a b). counts: c(a b)=2, c(b a)=2, c(a c)=1;
    // c1(a·)=3, c1(b·)=2; n1l(a)=2, n1l(b)=1;
    // n1r(b)=1 (only a_), n1r(a)=1 (only b_), n1r(c)=1; T=3 types
    val D = 0.75
    def p(c2: Double, c1: Double, n1l: Double, n1r: Double): Double =
      (c2 - D) / c1 + (D * n1l / c1) * (n1r / 3.0)
    val pAB = p(2, 3, 2, 1)
    val pBA = p(2, 2, 1, 1)
    val pAC = p(1, 3, 2, 1)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = r6((-math.log(pAB) - math.log(pBA) - math.log(pAC)) / 3.0)
    val exp2 = r6((-math.log(pBA) - math.log(pAB)) / 2.0)
    assert(out(1L)._1 == 3 && math.abs(out(1L)._2 - exp1) < 1e-9,
      s"doc1 ${out(1L)} vs $exp1")
    assert(out(2L)._1 == 2 && math.abs(out(2L)._2 - exp2) < 1e-9,
      s"doc2 ${out(2L)} vs $exp2")
    assert(out(3L) == ((0, 0.0)))
    // the KN normalization: summed over the FULL right vocabulary
    // (seen pairs discounted, unseen pairs pure continuation mass)
    // each context's distribution sums to exactly 1
    val rightVocab = Seq("a" -> 1.0, "b" -> 1.0, "c" -> 1.0) // n1r each
    for ((w1, c1, n1l, seen) <- Seq(
        ("a", 3.0, 2.0, Map("b" -> 2.0, "c" -> 1.0)),
        ("b", 2.0, 1.0, Map("a" -> 2.0)))) {
      val lambda = D * n1l / c1
      val total = rightVocab.map { case (w2, n1r) =>
        seen.get(w2) match {
          case Some(c2) => (c2 - D) / c1 + lambda * (n1r / 3.0)
          case None => lambda * (n1r / 3.0)
        }
      }.sum
      assert(math.abs(total - 1.0) < 1e-12, s"context $w1 mass $total")
    }
  }

  test("DSIR importanceScore: target-vocab docs score positive, background-vocab negative, empty doc zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha beta", "en"),   // target vocabulary
      (2L, "alpha beta gamma", "en"),
      (3L, "rho sigma rho sigma", "de"),     // background-only vocabulary
      (4L, "rho sigma tau", "de"),
      (5L, "alpha beta alpha", "de"),        // de doc that SOUNDS en
      (6L, "", "de"))
      .toDF("doc_id", "text", "lang")
    val out = Dsir.importanceScore(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // target-vocab docs: tokens far more frequent in the en slice
    assert(out(1L)._2 > 0 && out(1L)._3)
    assert(out(2L)._2 > 0 && out(2L)._3)
    // background-only vocab: ct = 0, cr > 0 -> negative
    assert(out(3L)._2 < 0 && !out(3L)._3)
    assert(out(4L)._2 < 0 && !out(4L)._3)
    // selection follows CONTENT, not the label: the en-sounding de doc
    // is selected (the whole point of importance resampling)
    assert(out(5L)._2 > 0 && out(5L)._3)
    // empty text: zero tokens, zero score, not selected
    assert(out(6L) == ((0, 0.0, false)))
    // hand-check doc 3 exactly: every token has ct=0;
    // s = ln(1/(nt+v)) - ln((cr+1)/(nr+v)); nt=7 en tokens, nr=17
    // total, v=6 distinct words, cr(rho)=cr(sigma)=3
    val (nt, nr, v) = (7.0, 17.0, 6.0)
    val sRho = math.log(1.0 / (nt + v)) - math.log((3.0 + 1.0) / (nr + v))
    val expected3 = BigDecimal(sRho) // all 4 occurrences score identically
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(3L)._2 - expected3) < 1e-9,
      s"doc 3: ${out(3L)._2} vs $expected3")
  }

  test("frozen-stats pruneTo: deterministic top-N artifacts; cap still fails loudly") {
    import spark.implicits._
    val knDocs = Seq((1L, "a b a c"), (2L, "b a b"), (3L, "c")).toDF("doc_id", "text")
    // bigram counts: (a b)=2, (b a)=2, (a c)=1 -> top-2 by (count DESC,
    // text ASC) = {a b, b a}; the pruned artifact's stats are those of
    // the KEPT table (types=2, a's continuation row loses "a c")
    val pruned = LmScore.knStats(knDocs, "text", pruneTo = 2)
    assert(pruned.big.keySet == Set("a b", "b a") && pruned.types == 2.0)
    assert(pruned.left("a") == ((2.0, 1.0)) && pruned.left("b") == ((2.0, 1.0)))
    // over-cap without pruneTo fails BEFORE the collect, naming the fallback
    val err = intercept[IllegalArgumentException] {
      LmScore.knStats(knDocs, "text", maxTypes = 2)
    }
    assert(err.getMessage.contains("pruneTo"), err.getMessage)
    // and pruneTo brings the same corpus under the same cap
    assert(LmScore.knStats(knDocs, "text", maxTypes = 2, pruneTo = 2).types == 2.0)

    val dsirDocs = Seq(
      (1L, "alpha beta alpha beta", "en"), (2L, "alpha beta gamma", "en"),
      (3L, "rho sigma rho sigma", "de"), (4L, "rho sigma tau", "de"),
      (5L, "alpha beta alpha", "de")).toDF("doc_id", "text", "lang")
    // word counts: alpha=5, beta=4, rho=3, sigma=3, gamma=1, tau=1 ->
    // top-3 by (count DESC, word ASC) = alpha, beta, then the 3-count
    // tie resolves alphabetically: rho
    val d = Dsir.dsirStats(dsirDocs, "text", col("lang") === "en", pruneTo = 3)
    assert(d.counts.keySet == Set("alpha", "beta", "rho"), d.counts.keySet.toString)
    assert(d.v == 3.0 && d.nr == 12.0)
    val derr = intercept[IllegalArgumentException] {
      Dsir.dsirStats(dsirDocs, "text", col("lang") === "en", maxVocab = 3)
    }
    assert(derr.getMessage.contains("pruneTo"), derr.getMessage)
  }

  test("perplexityBuckets: NTILE sizes per stratum, monotone scores across buckets, total assignment") {
    import spark.implicits._
    // 7 en docs + 5 de docs with graded repetitiveness (repeated
    // bigrams score fluent, unique-bigram docs score rare)
    val docs = (
      (1 to 7).map(i => (i.toLong, ("common pair " * i) + s"unique$i tail$i", "en")) ++
      (8 to 12).map(i => (i.toLong, s"wort$i folge$i " * 2 + "gemeinsame folge", "de"))
    ).toDF("doc_id", "text", "lang")
    val out = LmScore.perplexityBuckets(docs, "doc_id", "text", "lang", buckets = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getInt(4)))
    assert(out.length == 12 && out.forall(r => r._4 >= 1 && r._4 <= 3))
    for ((lang, n) <- Seq("en" -> 7, "de" -> 5)) {
      val g = out.filter(_._2 == lang)
      assert(g.length == n)
      // NTILE: first (n mod k) tiles get the extra row
      val sizes = (1 to 3).map(b => g.count(_._4 == b))
      val (q, r) = (n / 3, n % 3)
      assert(sizes == (1 to 3).map(b => q + (if (b <= r) 1 else 0)),
        s"$lang tile sizes $sizes")
      // monotone: head scores <= middle <= tail
      for (b <- 1 to 2) {
        val hi = g.filter(_._4 == b).map(_._3).max
        val lo = g.filter(_._4 == b + 1).map(_._3).min
        assert(hi <= lo, s"$lang bucket $b max $hi > bucket ${b + 1} min $lo")
      }
    }
  }
}
