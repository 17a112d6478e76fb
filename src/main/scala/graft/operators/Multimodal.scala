package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: media (image/audio/video) travels as an
 * opaque `binary` column with typed metadata extracted beside it.
 *
 * The Spark-side machinery — schema, per-partition batched iteration,
 * column append — is real and tested. The actual byte decoding is a
 * **STUB**: no image/audio codec libraries exist in this environment,
 * so [[FakeDecoder]] derives deterministic metadata from the byte
 * content alone. Swapping in a real decoder is a one-function change
 * (replace `FakeDecoder.decode`) that does not touch the plumbing.
 */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB decoder: deterministic metadata from byte length/content —
    * stands in for an image header parse (magic bytes -> format,
    * dimensions). Replace with a real codec for production. */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int, String) = {
      val len = bytes.length.toLong
      val width = (32 + len % 600).toInt
      val height = (32 + (len * 7) % 600).toInt
      val format = (len % 3) match {
        case 0 => "jpeg"
        case 1 => "png"
        case _ => "webp"
      }
      (width, height, 3, format)
    }
  }

  /**
   * Append a `metaCol: struct<width,height,channels,format>` decoded
   * from `binCol`. Runs as `mapPartitions` over the row iterator —
   * streaming, no partition materialization — the same batch shape a
   * real decoder (which wants batched I/O) needs.
   */
  def withDecodedMeta(df: DataFrame, binCol: String, metaCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(metaCol, metaSchema, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    // Dataset-typed mapPartitions (NOT df.rdd + createDataFrame): stays
    // one logical plan — no ExistingRDD rescan, no separate job, and
    // upstream filters/projections still optimize around it.
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Row.fromSeq(r.toSeq :+ null) // null payload -> null meta
        else {
          val (w, h, c, f) = FakeDecoder.decode(bytes)
          Row.fromSeq(r.toSeq :+ Row(w, h, c, f))
        }
      }
    }(Encoders.row(outSchema))
  }

  /**
   * REAL feature extraction (no codec needed): 256-bin byte histogram,
   * L1-normalized, as `array<float>` — a legitimate content signature
   * for opaque binaries (format detection, corruption triage, and
   * near-dup candidate generation via the embedding operators:
   * histogram vectors feed [[Similarity]] unchanged). mapPartitions
   * over the row iterator, one pass per payload.
   */
  def byteHistogramFeatures(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false), nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it => // typed, single-plan — see withDecodedMeta
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null || bytes.isEmpty) Row.fromSeq(r.toSeq :+ null)
        else {
          val counts = new Array[Int](256)
          var i = 0
          while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
          val n = bytes.length.toFloat
          Row.fromSeq(r.toSeq :+ counts.map(_ / n).toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Resize STUB: deterministic byte subsampling to `targetBytes`
   * (every ceil(len/target)-th byte) standing in for an image resize —
   * the plumbing (binary in, smaller binary out, metadata updated) is
   * real; swap the sampler for a real scaler alongside
   * [[FakeDecoder]].
   */
  def resizeStub(df: DataFrame, binCol: String, outCol: String, targetBytes: Int): DataFrame = {
    require(targetBytes >= 1, "targetBytes must be >= 1")
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it => // typed, single-plan — see withDecodedMeta
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Row.fromSeq(r.toSeq :+ null)
        else if (bytes.length <= targetBytes) Row.fromSeq(r.toSeq :+ bytes)
        else {
          val stride = math.ceil(bytes.length.toDouble / targetBytes).toInt
          val out = Array.range(0, bytes.length, stride).map(bytes(_))
          Row.fromSeq(r.toSeq :+ out)
        }
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Frame-sampling stub for "video" payloads: emits one row per sampled
   * frame offset (every `stride` bytes stands in for every Nth frame),
   * carrying (doc id, frame_no, frame_bytes). Exercises the explode /
   * one-to-many shape a real frame sampler produces.
   */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, stride: Int): DataFrame =
    df.select(
      col(idCol),
      posexplode(
        transform(
          sequence(
            lit(0),
            greatest(floor((length(col(binCol)) - 1).cast("double") / stride).cast("int"), lit(0))),
          i => call_function("substring", col(binCol), i * lit(stride) + lit(1), lit(stride)))))
      .toDF(idCol, "frame_no", "frame_bytes")
}
