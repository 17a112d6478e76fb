package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Dev harness (round 11): grid-searches dyadic fc biases for a torch
// head maximizing the min argmax runner-up gap subject to a mixed
// class split at BOTH sf0.001 and sf0.01.
// Usage: Test/runMain graft.TuneR11 [enc|dec|sinpe]
object TuneR11 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("enc")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (m, vocab, cap, cls) = which match {
      case "enc" => (SparkEntry.encClsModel, 32, 11, true)
      case "dec" => (SparkEntry.decModel, 32, 12, false)
      case "sinpe" => (SparkEntry.sinPeModel, 64, 16, false)
      case "sgru" => (SparkEntry.stackedGruModel, 32, 12, false)
      case "dw" => (SparkEntry.mobileModel, 0, 0, false)
    }
    val all = for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) yield
      if (which == "dw") {
      // image path: the q140 PGM synth through the real codec
      val synth = udf((docId: Long) => {
        val header = "P5\n8 8\n255\n".getBytes("US-ASCII")
        val px = Array.tabulate(64)(i =>
          (((docId * 2246822519L) ^ ((i / 8) * 30011L + (i % 8) * 12007L +
            docId * 5003L)) % 256).toByte)
        header ++ px
      })
      val imgs = graft.operators.Multimodal.resizeImage(
        spark.read.parquet(dir + "/documents.parquet")
          .select(col("doc_id"), synth(col("doc_id")).as("img")),
        "img", "px", 8, 8)
      val bc = spark.sparkContext.broadcast(m)
      graft.torch.Torch.inferImageBatched(
          imgs.select(col("doc_id"), col("px.pixels").as("pixels")),
          "pixels", "logits", bc, c = 1, h = 8, w = 8, batchSize = 256)
        .select(col("logits")).collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    } else {
      val words = spark.read.parquet(dir + "/documents.parquet").select(col("doc_id"),
        slice(transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab),
          1, cap).as("word_ids"))
        .filter(size(col("word_ids")) >= 1)
      val toks =
        if (cls) words.select(col("doc_id"),
          concat(array(lit(0L)), col("word_ids")).as("tok_ids"))
        else words.withColumnRenamed("word_ids", "tok_ids")
      val bc = spark.sparkContext.broadcast(m)
      graft.torch.Torch.inferBatched(toks, "tok_ids", "logits", bc, batchSize = 256)
        .select(col("logits")).collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    }
    // search additive (0, b1, b2) on the 1/16 grid around the medians
    val l0 = all.flatten
    val med = (0 until 3).map(c => l0.map(_(c)).sorted.apply(l0.length / 2))
    println(s"medians: ${med.mkString(", ")}  n=${all.map(_.length).mkString("/")}")
    val c1 = math.round((med(0) - med(1)) * 16).toInt
    val c2 = math.round((med(0) - med(2)) * 16).toInt
    var best: (Double, Double, Double, String) = (0, 0, Double.MinValue, "")
    for (b1x <- c1 - 24 to c1 + 24; b2x <- c2 - 24 to c2 + 24) {
      val b1 = b1x / 16.0; val b2 = b2x / 16.0
      var minGap = Double.MaxValue
      var ok = true
      val desc = new StringBuilder
      for (ls <- all if ok) {
        val counts = Array.fill(3)(0)
        for (l <- ls) {
          val d = Array(l(0), l(1) + b1, l(2) + b2)
          val c = d.indexOf(d.max)
          counts(c) += 1
          val s0 = d.sorted
          minGap = math.min(minGap, s0(2) - s0(1))
        }
        if (counts.exists(_ < ls.length / 10)) ok = false
        desc ++= counts.mkString("/") + " "
      }
      if (ok && minGap > best._3) best = (b1, b2, minGap, desc.toString)
    }
    println(s"BEST b1=${best._1} b2=${best._2} minGap=${best._3} counts=${best._4}")
    spark.stop()
  }
}
