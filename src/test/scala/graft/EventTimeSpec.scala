package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The events fixture has shipped `ts` three different ways across
 * driver generations: parquet TIMESTAMP(NANOS) (readable by Spark 4
 * only as raw-nanos LongType under the legacy conf), TIMESTAMP(MICROS)
 * without the UTC flag (read as TIMESTAMP_NTZ), and plain
 * TimestampType. [[EventTime.normalize]] must map all three to the
 * same TimestampType instants — this spec builds each layout and pins
 * the resulting epoch values against each other.
 */
class EventTimeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val micros = Seq(786297600000000L, 786297601500000L, 996623999999999L)

  test("raw-nanos LongType, NTZ micros, and LTZ all normalize to the same instants") {
    import spark.implicits._
    val asLong = micros.map(_ * 1000L).toDF("ts") // nanos-as-long layout
    val asLtz = micros.toDF("m")
      .select(timestamp_micros(col("m")).as("ts"))
    val asNtz = asLtz.select(col("ts").cast(TimestampNTZType).as("ts"))

    def epochs(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val out = EventTime.normalize(df)
      assert(out.schema("ts").dataType == TimestampType)
      out.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
    }
    assert(epochs(asLong) == micros.sorted)
    assert(epochs(asNtz) == micros.sorted)
    assert(epochs(asLtz) == micros.sorted)
  }

  test("normalize round-trips a parquet-written NTZ column (the current fixture layout)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evts").toString
    micros.toDF("m")
      .select(timestamp_micros(col("m")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events")
    val back = spark.read.parquet(s"$dir/events")
    assert(back.schema("ts").dataType == TimestampNTZType)
    val out = EventTime.normalize(back)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
    assert(out == micros.sorted)
  }
}
