package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Video columns as opaque binaries + typed metadata — the third
 * modality leg ([[Multimodal]] images / frame sampling, [[Audio]]
 * WAV). A pure-JVM ISO-BMFF (MP4) BOX parser walks the container tree
 * (`ftyp` brand, `moov/mvhd` timescale+duration, `moov/trak/tkhd`
 * track count and presentation dims) — the metadata a crawl pipeline
 * filters and routes on. No codec is touched: frame DECODE would need
 * an H.264/AV1 implementation that has no JVM analog here, so pixel
 * access stays behind [[Multimodal.sampleFrames]]'s documented stub,
 * while the container parsing below is REAL byte-level work (64-bit
 * largesize boxes, nested walks, bounds checks). Corrupt or
 * non-ISO-BMFF payloads degrade to null, never crash.
 */
object Video {

  final case class Mp4Meta(brand: String, timescale: Long, duration: Long,
      nTracks: Int, width: Int, height: Int) {
    def durationMs: Long = if (timescale == 0) 0L else duration * 1000L / timescale
  }

  object Mp4Parser {
    def decode(b: Array[Byte]): Option[Mp4Meta] = {
      def u32(i: Int): Long =
        ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
          ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
      def tag(i: Int) = new String(b, i, 4, "US-ASCII")

      // walk the boxes in [from, to); call f(type, payloadStart, payloadEnd)
      def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Boolean = {
        var p = from
        while (p + 8 <= to) {
          val sz0 = u32(p)
          val typ = tag(p + 4)
          var payload = p + 8
          val end = sz0 match {
            case 0 => to // box extends to the end of the enclosing space
            case 1 => // 64-bit largesize follows the type
              if (p + 16 > to) return false
              val big = u64(p + 8)
              if (big < 16 || p + big > to) return false
              payload = p + 16
              p + big.toInt
            case n =>
              if (n < 8 || p + n > to) return false
              p + n.toInt
          }
          f(typ, payload, end)
          p = end
        }
        p == to
      }

      if (b.length < 12 || tag(4) != "ftyp") return None
      var brand: String = null
      var timescale = -1L
      var duration = -1L
      var nTracks = 0
      var width = 0
      var height = 0
      val ok = walk(0, b.length) { (typ, s, e) =>
        typ match {
          case "ftyp" if e - s >= 4 => brand = tag(s)
          case "moov" =>
            walk(s, e) { (t2, s2, e2) =>
              t2 match {
                case "mvhd" if e2 - s2 >= 4 =>
                  val version = b(s2) & 0xff
                  if (version == 1 && e2 - s2 >= 28 + 4) {
                    // v1: ctime/mtime u64, timescale u32, duration u64
                    timescale = u32(s2 + 20)
                    duration = u64(s2 + 24)
                  } else if (version == 0 && e2 - s2 >= 20 + 4) {
                    timescale = u32(s2 + 12)
                    duration = u32(s2 + 16)
                  }
                case "trak" =>
                  nTracks += 1
                  walk(s2, e2) { (t3, s3, e3) =>
                    if (t3 == "tkhd") {
                      val version = b(s3) & 0xff
                      // width/height are the LAST two 16.16-fixed u32s
                      val off = if (version == 1) 4 + 8 + 8 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
                                else 4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36
                      if (e3 - s3 >= off + 8) {
                        val wFix = u32(s3 + off)
                        val hFix = u32(s3 + off + 4)
                        if (width == 0 && (wFix | hFix) != 0) {
                          width = (wFix >> 16).toInt
                          height = (hFix >> 16).toInt
                        }
                      }
                    }
                  }
                case _ => // udta / iods / ... skipped
              }
            }
          case _ => // mdat / free / skip ...
        }
      }
      if (!ok || brand == null || timescale <= 0 || duration < 0) None
      else Some(Mp4Meta(brand, timescale, duration, nTracks, width, height))
    }
  }

  /** Minimal ISO-BMFF writer for fixtures and tests: ftyp + moov(mvhd
    * v0 + one trak/tkhd per (w, h)) + an empty mdat. */
  def writeMp4(brand: String, timescale: Int, duration: Long,
      tracks: Seq[(Int, Int)]): Array[Byte] = {
    require(duration >= 0 && duration <= 0xFFFFFFFFL,
      s"duration $duration does not fit mvhd v0's u32") // v1 is parse-only
    require(brand.length == 4, s"brand must be a 4cc: '$brand'")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val bb = java.nio.ByteBuffer.allocate(8)
      bb.put(brand.getBytes("US-ASCII")).putInt(0)
      bb.array()
    })
    val mvhd = box("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0) // version 0 + flags
      bb.putInt(0).putInt(0) // ctime, mtime
      bb.putInt(timescale).putInt(duration.toInt)
      bb.array() // rate/volume/matrix/next_track_id left zero
    })
    val traks = tracks.map { case (w, h) =>
      box("trak", box("tkhd", {
        val bb = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36 + 8)
        bb.position(bb.capacity - 8)
        bb.putInt(w << 16).putInt(h << 16)
        bb.array()
      }))
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    ftyp ++ moov ++ box("mdat", Array.emptyByteArray)
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Typed MP4 container metadata per payload; null for anything the
    * parser rejects. One scan-side `mapPartitions` pass. */
  def withMp4Meta(df: DataFrame, binCol: String, outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, metaSchema, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it => // typed, single-plan — see Multimodal.withDecodedMeta
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val decoded =
          if (bytes == null) None
          else scala.util.Try(Mp4Parser.decode(bytes)).toOption.flatten
        decoded match {
          case None => Row.fromSeq(r.toSeq :+ null)
          case Some(m) => Row.fromSeq(r.toSeq :+
            Row(m.brand, m.durationMs, m.nTracks, m.width, m.height))
        }
      }
    }(Encoders.row(outSchema))
  }
}
