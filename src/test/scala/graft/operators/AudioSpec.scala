package graft.operators

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WavDecoder pinned against the JDK's own WAV reader
  * (javax.sound.sampled) on PCM8/PCM16 fixtures, byte-level hand
  * fixtures for 24-bit/float32, chunk-walking and corruption behavior,
  * and the frame-energy operator. */
class AudioSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def javaxDecode(bytes: Array[Byte]): (Float, Int, Int, Array[Byte]) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val f = in.getFormat
    val data = in.readAllBytes()
    (f.getSampleRate, f.getChannels, f.getSampleSizeInBits, data)
  }

  test("PCM16 mono and stereo: header + every sample == javax.sound decode") {
    val mono = Array.tabulate(400)(i => ((i * 37 % 4096) - 2048).toShort)
    val l = Array.tabulate(100)(i => (i * 11).toShort)
    val r = Array.tabulate(100)(i => (-i * 13).toShort)
    for ((bytes, chans, chanData) <- Seq(
        (Audio.writeWavPcm16(8000, Array(mono)), 1, Array(mono)),
        (Audio.writeWavPcm16(44100, Array(l, r)), 2, Array(l, r)))) {
      val w = Audio.WavDecoder.decode(bytes).get
      val (jRate, jCh, jBits, jData) = javaxDecode(bytes)
      assert(w.sampleRate == jRate.toInt && w.channels == jCh && w.bits == jBits)
      assert(w.channels == chans && w.nSamples == chanData(0).length)
      // javax hands back the interleaved little-endian frames verbatim
      val bb = java.nio.ByteBuffer.wrap(jData).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until w.nSamples; c <- 0 until chans) {
        val jv = bb.getShort()
        assert(jv == chanData(c)(i))
        assert(w.samples(c)(i) == jv / 32768.0, s"sample $i ch $c")
      }
    }
  }

  test("PCM8 unsigned: hand-built fixture == javax.sound decode, re-centered at 128") {
    val vals = Array[Int](0, 64, 128, 192, 255)
    val bb = java.nio.ByteBuffer.allocate(44 + vals.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + vals.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb.put("data".getBytes).putInt(vals.length)
    vals.foreach(v => bb.put(v.toByte))
    val bytes = bb.array()
    val w = Audio.WavDecoder.decode(bytes).get
    val (jRate, jCh, jBits, jData) = javaxDecode(bytes)
    assert(w.sampleRate == jRate.toInt && w.channels == jCh && w.bits == jBits && jBits == 8)
    for (i <- vals.indices) {
      assert((jData(i) & 0xff) == vals(i)) // javax leaves PCM8 unsigned
      assert(w.samples(0)(i) == (vals(i) - 128) / 128.0)
    }
  }

  test("24-bit PCM and IEEE float32: byte-level fixtures decode to exact values") {
    // 24-bit: values crafted to exercise sign extension
    val v24 = Seq(0x000000, 0x000001, 0x7FFFFF, 0x800000, 0xFFFFFF) // last two negative
    val bb = java.nio.ByteBuffer.allocate(44 + v24.length * 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + v24.length * 3).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(16000).putInt(16000 * 3).putShort(3).putShort(24)
    bb.put("data".getBytes).putInt(v24.length * 3)
    v24.foreach { v =>
      bb.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte).put(((v >> 16) & 0xff).toByte)
    }
    val w = Audio.WavDecoder.decode(bb.array()).get
    assert(w.bits == 24 && w.nSamples == 5)
    assert(w.samples(0).toSeq == Seq(0.0, 1 / 8388608.0, 8388607 / 8388608.0,
      -1.0, -1 / 8388608.0))
    // float32 (fmt code 3): raw IEEE bits pass through
    val vf = Seq(0.0f, 0.25f, -1.5f, 1e-3f)
    val fb = java.nio.ByteBuffer.allocate(44 + vf.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fb.put("RIFF".getBytes).putInt(36 + vf.length * 4).put("WAVE".getBytes)
    fb.put("fmt ".getBytes).putInt(16).putShort(3).putShort(1)
      .putInt(48000).putInt(48000 * 4).putShort(4).putShort(32)
    fb.put("data".getBytes).putInt(vf.length * 4)
    vf.foreach(fb.putFloat)
    val wf = Audio.WavDecoder.decode(fb.array()).get
    assert(wf.bits == 32 && wf.samples(0).toSeq == vf.map(_.toDouble))
  }

  test("chunk walking: LIST before data and odd-size word alignment; corrupt -> None") {
    val mono = Array.tabulate(10)(i => (i * 100).toShort)
    val canonical = Audio.writeWavPcm16(8000, Array(mono))
    // splice a 5-byte LIST chunk (odd size -> 1 pad byte) between fmt and data
    val extra = 8 + 5 + 1
    val bb = java.nio.ByteBuffer.allocate(canonical.length + extra)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(canonical, 0, 36) // RIFF..fmt chunk end
    bb.put("LIST".getBytes).putInt(5).put(Array[Byte](1, 2, 3, 4, 5)).put(0.toByte)
    bb.put(canonical, 36, canonical.length - 36)
    // fix RIFF size
    val spliced = bb.array()
    val riffSz = spliced.length - 8
    spliced(4) = (riffSz & 0xff).toByte; spliced(5) = ((riffSz >> 8) & 0xff).toByte
    spliced(6) = ((riffSz >> 16) & 0xff).toByte; spliced(7) = ((riffSz >> 24) & 0xff).toByte
    val w = Audio.WavDecoder.decode(spliced).get
    assert(w.nSamples == 10 && w.samples(0)(3) == 300 / 32768.0)
    // corruption surface: truncation, bad magic, compressed codec code
    assert(Audio.WavDecoder.decode(canonical.take(30)).isEmpty)
    val bad = canonical.clone(); bad(8) = 'X'.toByte
    assert(Audio.WavDecoder.decode(bad).isEmpty)
    val mp3 = canonical.clone(); mp3(20) = 85.toByte // WAVE_FORMAT_MPEGLAYER3
    assert(Audio.WavDecoder.decode(mp3).isEmpty)
  }

  test("G.711 mu-law and A-law: every code byte == javax.sound expansion") {
    import javax.sound.sampled.AudioFormat
    for ((tag, name) <- Seq(7 -> "ulaw", 6 -> "alaw")) {
      val codes = Array.tabulate(256)(i => i.toByte)
      val bytes = Audio.writeWavG711(8000, tag, codes)
      val w = Audio.WavDecoder.decode(bytes).get
      assert(w.sampleRate == 8000 && w.channels == 1 && w.bits == 8 &&
        w.nSamples == 256, s"$name header")
      // independent oracle: the JDK's own G.711 codec, converted to
      // linear PCM16 (the same segmented expansion by spec)
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val conv = AudioSystem.getAudioInputStream(pcmFmt, in)
      val data = conv.readAllBytes()
      assert(data.length == 512, s"$name javax bytes ${data.length}")
      val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until 256) {
        val jv = bb.getShort().toInt
        val ours = if (tag == 7) Audio.ulawToPcm16(i) else Audio.alawToPcm16(i)
        assert(ours == jv, s"$name code $i: $ours vs javax $jv")
        assert(w.samples(0)(i) == ours / 32768.0, s"$name normalized $i")
      }
    }
  }

  test("withWavFeatures + frameEnergies: hand-computed RMS/peak/zero-cross, null for junk") {
    import spark.implicits._
    val s1 = Array[Short](16384, -16384, 16384, -16384) // alternating: 3 crossings
    val wav1 = Audio.writeWavPcm16(8000, Array(s1))
    val df = Seq((1L, wav1), (2L, "junk".getBytes)).toDF("id", "wav")
    val got = Audio.withWavFeatures(df, "wav", "af")
      .select(col("id"), col("af")).collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val f1 = got(1L)
    assert(f1.getInt(0) == 8000 && f1.getInt(3) == 4)
    assert(f1.getDouble(4) == 4.0 / 8000)
    assert(f1.getDouble(5) == 0.5) // all |s| = 2^14/2^15
    assert(f1.getDouble(6) == 0.5 && f1.getInt(7) == 3)
    assert(got(2L) == null)
    val fe = Audio.frameEnergies(df, "id", "wav", frameLen = 2, hop = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(fe.toSeq == Seq((1L, 0, 0.5), (1L, 1, 0.5))) // junk row contributes none
  }
}
