package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MP4 container parser: writer roundtrip, mvhd version 1,
  * 64-bit largesize and size-0 box walking, corruption surface, and
  * the DataFrame operator. */
class VideoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("writeMp4 roundtrip: brand, duration, track count, first nonzero dims") {
    val bytes = Video.writeMp4("isom", timescale = 1000, duration = 2500,
      tracks = Seq((0, 0), (640, 360), (1280, 720)))
    val m = Video.Mp4Parser.decode(bytes).get
    assert(m.brand == "isom" && m.timescale == 1000 && m.duration == 2500)
    assert(m.durationMs == 2500 && m.nTracks == 3)
    // the zero-dim (audio-style) track is skipped; first video track wins
    assert(m.width == 640 && m.height == 360)
  }

  test("mvhd version 1 (64-bit times) parses; timescale 90k maps to ms") {
    val mvhdV1 = {
      val bb = java.nio.ByteBuffer.allocate(8 + 32)
      bb.putInt(8 + 32).put("mvhd".getBytes)
      bb.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1 + flags
      bb.putLong(0L).putLong(0L) // ctime, mtime (u64)
      bb.putInt(90000) // timescale
      bb.putLong(180000L) // duration (u64) = 2 s
      bb.array()
    }
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "mp42".getBytes ++ Array[Byte](0, 0, 0, 0))
    val bytes = ftyp ++ box("moov", mvhdV1)
    val m = Video.Mp4Parser.decode(bytes).get
    assert(m.brand == "mp42" && m.timescale == 90000 && m.durationMs == 2000)
    assert(m.nTracks == 0 && m.width == 0)
  }

  test("largesize (size==1) and size==0 boxes walk correctly") {
    val base = Video.writeMp4("isom", 1000, 1500, Seq((320, 240)))
    // append a largesize 'free' box then a size-0 'skip' box to the end
    val free = {
      val bb = java.nio.ByteBuffer.allocate(16 + 5)
      bb.putInt(1).put("free".getBytes).putLong(16 + 5).put(Array[Byte](1, 2, 3, 4, 5))
      bb.array()
    }
    val skip = {
      val bb = java.nio.ByteBuffer.allocate(8 + 3)
      bb.putInt(0).put("skip".getBytes).put(Array[Byte](9, 9, 9))
      bb.array()
    }
    val m = Video.Mp4Parser.decode(base ++ free ++ skip).get
    assert(m.durationMs == 1500 && m.width == 320)
  }

  test("corruption surface: truncation, missing ftyp, lying box sizes -> None") {
    val good = Video.writeMp4("isom", 1000, 1000, Seq((64, 64)))
    assert(Video.Mp4Parser.decode(good.take(20)).isEmpty) // truncated mid-box
    val noFtyp = good.clone(); noFtyp(4) = 'x'.toByte
    assert(Video.Mp4Parser.decode(noFtyp).isEmpty)
    val lying = good.clone()
    lying(0) = 0x7f.toByte // ftyp claims a size far past the buffer
    assert(Video.Mp4Parser.decode(lying).isEmpty)
    assert(Video.Mp4Parser.decode("RIFFnope".getBytes).isEmpty)
  }

  test("withMp4Meta: typed metadata per row, null for junk") {
    import spark.implicits._
    val df = Seq(
      (1L, Video.writeMp4("isom", 1000, 3200, Seq((1920, 1080)))),
      (2L, "definitely not an mp4".getBytes)).toDF("id", "v")
    val got = Video.withMp4Meta(df, "v", "meta")
      .select(col("id"), col("meta")).collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val m1 = got(1L)
    assert(m1.getString(0) == "isom" && m1.getLong(1) == 3200 &&
      m1.getInt(2) == 1 && m1.getInt(3) == 1920 && m1.getInt(4) == 1080)
    assert(got(2L) == null)
  }
}
