package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(l: String, n: Int = 10)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); (0 until n).foreach(_ => f)
      println(f"$l%-34s ${(System.nanoTime() - t0) / 1e6 / n}%8.2f ms/op")
    }
    time("queries-map-build") { SparkEntry.queries; () }
    time("read.parquet(documents)") { spark.read.parquet(s"$sfDir/documents.parquet"); () }
    time("read+select+filter chain") {
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text")).filter(col("doc_id") > 0)
        .select(col("doc_id")); () }
    val m = SparkEntry.genModel
    time("broadcast(model)") { spark.sparkContext.broadcast(m); () }
    time("quantize(model)") { graft.torch.TorchQuant.quantize(m, 7); () }
    time("full q282 build") { SparkEntry.queries("q282_torch_kv_window")(spark, sfDir); () }
    time("full q05 build") { SparkEntry.queries("q05_agg_pricing")(spark, sfDir); () }
    spark.stop()
  }
}
