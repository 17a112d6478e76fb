package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Normalizes the `events.ts` fixture column to TimestampType regardless
  * of how the driver generated the parquet. Generations of the testdata
  * have shipped it as parquet TIMESTAMP(NANOS) — which Spark 4 only reads
  * as raw-nanos LongType under `spark.sql.legacy.parquet.nanosAsLong` —
  * and as TIMESTAMP(MICROS) without the UTC-adjusted flag, which Spark
  * reads as TIMESTAMP_NTZ. Both encode the same wall-clock-UTC instants,
  * and every session here runs with `spark.sql.session.timeZone=UTC`, so
  * the NTZ→LTZ cast is instant-preserving and agrees with DuckDB's
  * `epoch(ts)` over the same file.
  *
  * Works on both batch and streaming DataFrames (pure column transform).
  */
object EventTime {
  def normalize(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      // A LongType ts is only ever produced by Spark's nanosAsLong legacy
      // read of TIMESTAMP(NANOS); any other origin (a fixture shipping
      // epoch micros/millis as plain BIGINT) would be silently scaled
      // 1000x wrong by the div below — the same silent-drift class this
      // shim exists to fix (ADVICE r9). Refuse to guess: require the
      // session to have opted into the nanos read explicitly.
      require(
        df.sparkSession.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          .contains("true"),
        "events.ts is LongType but spark.sql.legacy.parquet.nanosAsLong is " +
          "not set: cannot assume the epoch unit is nanoseconds")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df // already TimestampType
  }
}
