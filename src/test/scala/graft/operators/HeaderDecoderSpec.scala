package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}

/** Hand-crafted headers per the public format specs — the decoder must
  * read dimensions/channels from real byte layouts, not guess. */
class HeaderDecoderSpec extends AnyFunSuite {

  private def png(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(26 + 7).order(ByteOrder.BIG_ENDIAN)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13) // IHDR length
    bb.put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(8.toByte) // bit depth
    bb.put(colorType.toByte)
    bb.put(new Array[Byte](3)) // compression/filter/interlace
    bb.array()
  }

  private def jpeg(w: Int, h: Int, comps: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(64).order(ByteOrder.BIG_ENDIAN)
    bb.put(0xff.toByte).put(0xd8.toByte) // SOI
    // APP0 segment to force a marker walk
    bb.put(0xff.toByte).put(0xe0.toByte).putShort(6).put(Array[Byte]('J', 'F', 'I', 'F'))
    // SOF0
    bb.put(0xff.toByte).put(0xc0.toByte).putShort((8 + 3 * comps).toShort)
    bb.put(8.toByte) // precision
    bb.putShort(h.toShort).putShort(w.toShort)
    bb.put(comps.toByte)
    bb.array()
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
    bb.putShort(w.toShort).putShort(h.toShort)
    bb.put(new Array[Byte](3))
    bb.array()
  }

  private def bmp(w: Int, h: Int, bpp: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54) // file size (don't care)
    bb.putInt(0).putInt(54) // reserved, data offset
    bb.putInt(40) // DIB header size
    bb.putInt(w).putInt(h)
    bb.putShort(1) // planes
    bb.putShort(bpp.toShort)
    bb.array()
  }

  test("PNG IHDR: dimensions and color-type channels") {
    assert(Multimodal.HeaderDecoder.decode(png(640, 480, 6)) == Some((640, 480, 4, "png")))
    assert(Multimodal.HeaderDecoder.decode(png(1, 99999, 0)) == Some((1, 99999, 1, "png")))
    assert(Multimodal.HeaderDecoder.decode(png(320, 200, 2)) == Some((320, 200, 3, "png")))
  }

  test("JPEG: marker walk past APP0 to SOF0") {
    assert(Multimodal.HeaderDecoder.decode(jpeg(1920, 1080, 3)) == Some((1920, 1080, 3, "jpeg")))
    assert(Multimodal.HeaderDecoder.decode(jpeg(8, 8, 1)) == Some((8, 8, 1, "jpeg")))
  }

  test("GIF logical screen descriptor") {
    assert(Multimodal.HeaderDecoder.decode(gif(256, 192)) == Some((256, 192, 3, "gif")))
  }

  test("BMP DIB header, including bottom-up negative height") {
    assert(Multimodal.HeaderDecoder.decode(bmp(800, 600, 24)) == Some((800, 600, 3, "bmp")))
    assert(Multimodal.HeaderDecoder.decode(bmp(64, -64, 32)) == Some((64, 64, 4, "bmp")))
  }

  test("JPEG: 0xFF fill bytes before markers, EOI/SOS stop, TEM standalone") {
    // padded: SOI, FF-fill, APP0, FF-fill-fill, SOF0 (T.81 B.1.1.2)
    val bb = ByteBuffer.allocate(64).order(ByteOrder.BIG_ENDIAN)
    bb.put(0xff.toByte).put(0xd8.toByte) // SOI
    bb.put(0xff.toByte) // fill byte
    bb.put(0xff.toByte).put(0xe0.toByte).putShort(6).put(Array[Byte]('J', 'F', 'I', 'F'))
    bb.put(0xff.toByte).put(0xff.toByte) // two fill bytes
    bb.put(0xff.toByte).put(0x01.toByte) // TEM: standalone, no length word
    bb.put(0xff.toByte).put(0xc0.toByte).putShort(17)
    bb.put(8.toByte).putShort(480.toShort).putShort(640.toShort).put(3.toByte)
    assert(Multimodal.HeaderDecoder.decode(bb.array()) == Some((640, 480, 3, "jpeg")))

    // EOI before any SOFn: no dimensions exist — must be None, not a
    // desynced read of image data
    val eoi = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
    eoi.put(0xff.toByte).put(0xd8.toByte).put(0xff.toByte).put(0xd9.toByte)
    assert(Multimodal.HeaderDecoder.decode(eoi.array()).isEmpty)

    // SOS before SOFn (entropy-coded data follows unframed): stop
    val sos = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
    sos.put(0xff.toByte).put(0xd8.toByte)
    sos.put(0xff.toByte).put(0xda.toByte).putShort(4).put(1.toByte).put(0.toByte)
    assert(Multimodal.HeaderDecoder.decode(sos.array()).isEmpty)
  }

  test("PixelDecoder: BMP 24bpp bottom-up decodes to top-down RGB with row padding") {
    // 3x2 BMP, 24bpp: rows padded to 4 bytes (3*3=9 -> 12). Stored
    // bottom-up in BGR; decode must emit top-down RGB.
    val w = 3; val h = 2
    val rowBytes = 12
    val bb = ByteBuffer.allocate(54 + rowBytes * h).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
    bb.putInt(0).putInt(54) // reserved, data offset
    bb.putInt(40).putInt(w).putInt(h) // DIB, width, height (bottom-up)
    bb.putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
    bb.put(new Array[Byte](54 - bb.position()))
    // bottom row first (will be decoded as row 1): pixels B,G,R
    // bottom row: red, green, blue; top row: white, black, gray
    val bottom = Array[Int](0, 0, 255, /**/ 0, 255, 0, /**/ 255, 0, 0, 0, 0, 0)
    val top = Array[Int](255, 255, 255, /**/ 0, 0, 0, /**/ 128, 128, 128, 0, 0, 0)
    bottom.foreach(v => bb.put(v.toByte))
    top.foreach(v => bb.put(v.toByte))
    val Some((dw, dh, dc, px)) = Multimodal.PixelDecoder.decode(bb.array())
    assert((dw, dh, dc) == (3, 2, 3))
    def rgb(i: Int) = (px(i * 3) & 0xff, px(i * 3 + 1) & 0xff, px(i * 3 + 2) & 0xff)
    // top-down output: row 0 = the file's TOP row (stored last)
    assert(rgb(0) == ((255, 255, 255)) && rgb(1) == ((0, 0, 0)) && rgb(2) == ((128, 128, 128)))
    // row 1 = bottom row, BGR -> RGB reordered
    assert(rgb(3) == ((255, 0, 0)) && rgb(4) == ((0, 255, 0)) && rgb(5) == ((0, 0, 255)))
  }

  test("PixelDecoder: binary PGM/PPM with comments; nearest-neighbor resize exact") {
    val pgm = ("P5 # comment\n4 2\n255\n").getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val Some((w, h, c, px)) = Multimodal.PixelDecoder.decode(pgm)
    assert((w, h, c) == (4, 2, 1) && px.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60, 70, 80))
    // nearest-neighbor 4x2 -> 2x1: picks (0,0) and (0,2)
    val rs = Multimodal.PixelDecoder.resize(px, 4, 2, 1, 2, 1)
    assert(rs.toSeq == Seq[Byte](10, 30))
    // identity resize
    assert(Multimodal.PixelDecoder.resize(px, 4, 2, 1, 4, 2).toSeq == px.toSeq)
    // PPM: 1x2 RGB
    val ppm = "P6\n1 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val Some((pw, ph, pc, ppx)) = Multimodal.PixelDecoder.decode(ppm)
    assert((pw, ph, pc) == (1, 2, 3) && ppx.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    // truncated raster -> None, not garbage
    assert(Multimodal.PixelDecoder.decode(ppm.dropRight(1)).isEmpty)
    // compressed formats are honestly not decodable without a codec
    assert(Multimodal.PixelDecoder.decode(jpeg(8, 8, 3)).isEmpty)
  }

  test("PixelDecoder: crafted BMP headers cannot crash — overflow/negative fields -> None") {
    // all fields attacker-controlled: each of these used to throw
    // (NegativeArraySize / ArrayIndexOutOfBounds) instead of None
    def bmp(dataOff: Int, w: Int, h: Int, bpp: Short = 24, compression: Int = 0,
        payload: Int = 64): Array[Byte] = {
      val bb = ByteBuffer.allocate(54 + payload).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + payload)
      bb.putInt(0).putInt(dataOff)
      bb.putInt(40).putInt(w).putInt(h)
      bb.putShort(1).putShort(bpp).putInt(compression)
      bb.array()
    }
    import Multimodal.PixelDecoder.decode
    assert(decode(bmp(54, Int.MaxValue, 2)).isEmpty) // w*c overflows Int
    assert(decode(bmp(54, 0x40000000, 2)).isEmpty) // rowBytes overflows
    assert(decode(bmp(54, 3, Int.MinValue)).isEmpty) // abs(MinValue) < 0
    assert(decode(bmp(-4, 3, 2)).isEmpty) // negative data offset
    assert(decode(bmp(0, 3, 2)).isEmpty) // offset inside the header
    assert(decode(bmp(54, 65537, 1)).isEmpty) // over the dim cap
    assert(decode(bmp(54, 46341, 46341)).isEmpty) // w*h*c > Int.MaxValue
    // and a PGM whose dimension digit-run would wrap Int
    val evil = "P5 99999999999999999999 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1)
    assert(decode(evil).isEmpty)
    // healthy small BMP still decodes after the hardening
    val good = {
      val bb = ByteBuffer.allocate(54 + 4).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(58).putInt(0).putInt(54)
      bb.putInt(40).putInt(1).putInt(1).putShort(1).putShort(24).putInt(0)
      bb.position(54); bb.put(1.toByte).put(2.toByte).put(3.toByte)
      bb.array()
    }
    assert(decode(good).map(t => (t._1, t._2, t._3)) == Some((1, 1, 3)))
  }

  // ---- real PNG fixtures: deflate + forward filtering + CRC chunks,
  // straight from the spec (RFC 2083) — the decoder must invert these ----

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Encode pixels as a valid PNG: per-row forward filter (enc = raw -
    * predictor mod 256), zlib deflate, chunked with CRCs. `filters(y)`
    * picks the scanline filter for row y. */
  private def pngFull(w: Int, h: Int, c: Int, px: Array[Byte], filters: Seq[Int],
      idatSplit: Int = Int.MaxValue, extraChunk: Boolean = false,
      interlace: Int = 0, depth: Int = 8): Array[Byte] = {
    val ct = c match { case 1 => 0 case 2 => 4 case 3 => 2 case 4 => 6 }
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(w).putInt(h).put(depth.toByte).put(ct.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
    val rowBytes = w * c
    val raw = new Array[Byte]((rowBytes + 1) * h)
    for (y <- 0 until h) {
      val f = filters(y)
      raw(y * (rowBytes + 1)) = f.toByte
      for (x <- 0 until rowBytes) {
        val cur = px(y * rowBytes + x) & 0xff
        val left = if (x >= c) px(y * rowBytes + x - c) & 0xff else 0
        val up = if (y > 0) px((y - 1) * rowBytes + x) & 0xff else 0
        val ul = if (y > 0 && x >= c) px((y - 1) * rowBytes + x - c) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(y * (rowBytes + 1) + 1 + x) = (cur - pred).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zlen = defl.deflate(zbuf)
    defl.end()
    val z = java.util.Arrays.copyOf(zbuf, zlen)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val idats =
      if (z.length > idatSplit)
        pngChunk("IDAT", z.take(idatSplit)) ++ pngChunk("IDAT", z.drop(idatSplit))
      else pngChunk("IDAT", z)
    val extra = if (extraChunk) pngChunk("tEXt", "k v".getBytes("ISO-8859-1"))
      else Array.empty[Byte]
    sig ++ pngChunk("IHDR", ihdr) ++ extra ++ idats ++ pngChunk("IEND", Array.empty)
  }

  test("PNG pixel decode: RGB with None/Sub/Up filters round-trips exactly") {
    val px = Array.tabulate(3 * 3 * 3)(i => ((i * 37 + 11) % 256).toByte)
    val file = pngFull(3, 3, 3, px, filters = Seq(0, 1, 2))
    assert(Multimodal.PixelDecoder.decode(file).map(_._4.toSeq) == Some(px.toSeq),
      "RGB None/Sub/Up decode mismatch")
  }

  test("PNG pixel decode: Average and Paeth filters, gray + RGBA + gray-alpha") {
    val gray = Array.tabulate(5 * 4)(i => ((i * 53 + 7) % 256).toByte)
    val g = Multimodal.PixelDecoder.decode(pngFull(5, 4, 1, gray, Seq(3, 4, 3, 4)))
    assert(g.map(t => (t._1, t._2, t._3)) == Some((5, 4, 1)))
    assert(g.map(_._4.toSeq) == Some(gray.toSeq), "gray Average/Paeth mismatch")
    val rgba = Array.tabulate(2 * 2 * 4)(i => ((i * 91 + 3) % 256).toByte)
    val r = Multimodal.PixelDecoder.decode(pngFull(2, 2, 4, rgba, Seq(4, 4)))
    assert(r.map(_._4.toSeq) == Some(rgba.toSeq), "RGBA Paeth mismatch")
    val ga = Array.tabulate(3 * 2 * 2)(i => ((i * 17 + 29) % 256).toByte)
    val a = Multimodal.PixelDecoder.decode(pngFull(3, 2, 2, ga, Seq(1, 3)))
    assert(a.map(t => (t._3, t._4.toSeq)) == Some((2, ga.toSeq)), "gray-alpha mismatch")
  }

  test("PNG pixel decode: split IDAT concatenates; ancillary chunks skipped") {
    val px = Array.tabulate(4 * 4 * 3)(i => ((i * 29) % 256).toByte)
    val split = pngFull(4, 4, 3, px, Seq(0, 1, 2, 4), idatSplit = 10, extraChunk = true)
    assert(Multimodal.PixelDecoder.decode(split).map(_._4.toSeq) == Some(px.toSeq))
  }

  /** Encode pixels as a REAL Adam7-interlaced PNG: each of the 7
    * passes is gathered as its own sub-image and forward-filtered
    * independently (`filterFor(pass, passRow)` picks the filter);
    * empty passes emit nothing, per the spec. */
  private def pngAdam7(w: Int, h: Int, c: Int, px: Array[Byte],
      filterFor: (Int, Int) => Int): Array[Byte] = {
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val bos = new java.io.ByteArrayOutputStream()
    for (((x0, y0, dx, dy), pi) <- passes.zipWithIndex) {
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        val sub = new Array[Byte](pw * ph * c)
        for (py <- 0 until ph; qx <- 0 until pw; ch <- 0 until c)
          sub((py * pw + qx) * c + ch) =
            px(((y0 + py * dy) * w + (x0 + qx * dx)) * c + ch)
        val rowB = pw * c
        for (py <- 0 until ph) {
          val f = filterFor(pi, py)
          bos.write(f)
          for (x <- 0 until rowB) {
            val cur = sub(py * rowB + x) & 0xff
            val left = if (x >= c) sub(py * rowB + x - c) & 0xff else 0
            val up = if (py > 0) sub((py - 1) * rowB + x) & 0xff else 0
            val ul = if (py > 0 && x >= c) sub((py - 1) * rowB + x - c) & 0xff else 0
            val pred = f match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) >> 1
              case 4 =>
                val p = left + up - ul
                val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
                if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            }
            bos.write((cur - pred) & 0xff)
          }
        }
      }
    }
    val ct = c match { case 1 => 0 case 2 => 4 case 3 => 2 case 4 => 6 }
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(w).putInt(h).put(8.toByte).put(ct.toByte)
      .put(0.toByte).put(0.toByte).put(1.toByte).array()
    val rawz = bos.toByteArray
    val defl = new java.util.zip.Deflater()
    defl.setInput(rawz); defl.finish()
    val zbuf = new Array[Byte](rawz.length + 64)
    val zlen = defl.deflate(zbuf)
    defl.end()
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    sig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", java.util.Arrays.copyOf(zbuf, zlen)) ++
      pngChunk("IEND", Array.empty)
  }

  test("PNG pixel decode: Adam7 interlace round-trips exactly, every filter") {
    // 10x9 RGB: all 7 passes non-empty; filters cycle 0..4 across
    // (pass, row) so every predictor runs inside a sub-image
    val px = Array.tabulate(10 * 9 * 3)(i => ((i * 41 + 13) % 256).toByte)
    val file = pngAdam7(10, 9, 3, px, (p, r) => (p + r) % 5)
    val got = Multimodal.PixelDecoder.decode(file)
    assert(got.map(t => (t._1, t._2, t._3)) == Some((10, 9, 3)))
    assert(got.map(_._4.toSeq) == Some(px.toSeq), "Adam7 RGB mismatch")
    // gray 8x8 (exactly one tile), RGBA 5x5, gray-alpha 3x3 (passes
    // 2/4 partially empty), 1x1 (only pass 1 exists), 2x1, 1x2
    for ((w, h, c) <- Seq((8, 8, 1), (5, 5, 4), (3, 3, 2), (1, 1, 3), (2, 1, 1), (1, 2, 3))) {
      val p = Array.tabulate(w * h * c)(i => ((i * 67 + 5) % 256).toByte)
      val d = Multimodal.PixelDecoder.decode(pngAdam7(w, h, c, p, (pi, r) => (pi + r) % 5))
      assert(d.map(t => (t._1, t._2, t._3, t._4.toSeq)) == Some((w, h, c, p.toSeq)),
        s"Adam7 ${w}x${h}x$c mismatch")
    }
  }

  test("PNG Adam7 decode agrees pixel-exact with the platform reader") {
    val (w, h) = (13, 7)
    val px = Array.tabulate(w * h * 3)(i => ((i * 29 + 3) % 256).toByte)
    val file = pngAdam7(w, h, 3, px, (p, r) => (2 * p + r) % 5)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(file))
    assert(ref != null && (ref.getWidth, ref.getHeight) == (w, h),
      "platform reader rejected the hand-built interlaced PNG")
    val Some((gw, gh, gc, gpx)) = Multimodal.PixelDecoder.decode(file)
    assert((gw, gh, gc) == (w, h, 3))
    val argb = ref.getRGB(0, 0, w, h, null, 0, w)
    for (i <- argb.indices) {
      val v = argb(i)
      assert(gpx(i * 3) == (v >> 16).toByte && gpx(i * 3 + 1) == (v >> 8).toByte &&
        gpx(i * 3 + 2) == v.toByte, s"pixel $i differs from the platform decode")
    }
  }

  test("PNG pixel decode: rejects out-of-scope and malformed payloads, never throws") {
    val px = Array.tabulate(2 * 2 * 3)(i => i.toByte)
    import Multimodal.PixelDecoder.decode
    // an interlace FLAG on a sequential-length raster is a short
    // stream for the 7-pass layout -> None, never a mis-decode
    assert(decode(pngFull(2, 2, 3, px, Seq(0, 0), interlace = 1)).isEmpty,
      "interlace flag with sequential payload")
    // truncated REAL interlaced stream
    val il = pngAdam7(6, 6, 3, Array.tabulate(6 * 6 * 3)(_.toByte), (_, _) => 0)
    assert(decode(il.dropRight(16)).isEmpty, "truncated Adam7")
    assert(decode(pngFull(2, 2, 3, px, Seq(0, 0), depth = 16)).isEmpty, "16-bit")
    val whole = pngFull(2, 2, 3, px, Seq(0, 0))
    assert(decode(whole.dropRight(20)).isEmpty, "truncated IDAT/IEND")
    assert(decode(whole.take(40)).isEmpty, "header only")
    // giant declared dims with a tiny stream: bounds reject, no OOM/throw
    val evil = whole.clone()
    evil(16) = 0x7f.toByte // width high byte -> ~2^31
    assert(decode(evil).isEmpty, "crafted width")
    // header-metadata path still agrees on the real file
    assert(Multimodal.HeaderDecoder.decode(whole) == Some((2, 2, 3, "png")))
  }

  // ---- real GIF fixtures: an independent LZW ENCODER (hash-map
  // dictionary, nothing shared with the decoder's prefix/suffix
  // arrays) + container builder, straight from the 89a spec ----

  /** GIF-flavor LZW encode: emits CLEAR, literals/dict codes with
    * growing width, END; LSB-first bit packing. */
  private def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0; var curBits = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      cur |= code << curBits; curBits += width
      while (curBits >= 8) { bits.write(cur & 0xff); cur >>= 8; curBits -= 8 }
    }
    val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    var next = clear + 2
    emit(clear)
    var run = Vector.empty[Byte]
    for (px <- indices) {
      val cand = run :+ px
      if (run.isEmpty || dict.contains(cand)) run = cand
      else {
        emit(if (run.length == 1) run.head & 0xff else dict(run))
        if (next < 4096) {
          dict(cand) = next; next += 1
          // widen when the entry count reaches the width bound —
          // mirrors the decoder's post-add growth exactly
          if (next == (1 << width) + 1 && width < 12) width += 1
        }
        run = Vector(px)
      }
    }
    if (run.nonEmpty) emit(if (run.length == 1) run.head & 0xff else dict(run))
    emit(end)
    if (curBits > 0) bits.write(cur & 0xff)
    bits.toByteArray
  }

  /** Assemble a single-frame GIF89a: global palette, optional
    * extension block, sub-block-chunked LZW data. */
  private def gifFull(w: Int, h: Int, palette: Array[Byte], indices: Array[Byte],
      minCode: Int, interlaced: Boolean = false, subBlock: Int = 255,
      extension: Boolean = false, localPalette: Boolean = false,
      frame: Option[(Int, Int, Int, Int)] = None): Array[Byte] = {
    require(palette.length % 3 == 0)
    val palBits = {
      var n = 1
      while (3 * (1 << (n + 1)) < palette.length) n += 1
      n // size field: 2^(n+1) entries
    }
    val palPadded = palette ++ new Array[Byte](3 * (1 << (palBits + 1)) - palette.length)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    bos.write(if (localPalette) 0x00 else 0x80 | palBits) // global table flag
    bos.write(0); bos.write(0) // bg color, aspect
    if (!localPalette) bos.write(palPadded)
    if (extension) { // graphics control extension, then a comment block
      bos.write(0x21); bos.write(0xf9); bos.write(4)
      bos.write(Array[Byte](0, 0, 0, 0)); bos.write(0)
      bos.write(0x21); bos.write(0xfe); bos.write(3)
      bos.write("abc".getBytes); bos.write(0)
    }
    bos.write(0x2c) // image descriptor (optionally a sub-frame)
    val (fl, ft, fw, fh) = frame.getOrElse((0, 0, w, h))
    le16(fl); le16(ft); le16(fw); le16(fh)
    bos.write((if (interlaced) 0x40 else 0) | (if (localPalette) 0x80 | palBits else 0))
    if (localPalette) bos.write(palPadded)
    bos.write(minCode)
    val z = lzwEncode(indices, minCode)
    var off = 0
    while (off < z.length) {
      val n = math.min(subBlock, z.length - off)
      bos.write(n); bos.write(z, off, n)
      off += n
    }
    bos.write(0) // data terminator
    bos.write(0x3b) // trailer
    bos.toByteArray
  }

  test("GIF pixel decode: LZW round-trip, palette to RGB, sub-block splits, extensions") {
    val pal = Array[Byte](
      0, 0, 0, /**/ 127, 0, 0, /**/ 0, 127, 0, /**/ 0, 0, 127,
      64, 64, 64, /**/ 127, 127, 0, /**/ 0, 127, 127, /**/ 127, 127, 127)
    // 7x5 image with runs (exercises dictionary growth + KwKwK)
    val idx = Array.tabulate[Byte](35)(i => (Seq(0, 0, 1, 1, 1, 2, 3, 3, 3, 3)(i % 10)).toByte)
    val g = gifFull(7, 5, pal, idx, minCode = 3, extension = true, subBlock = 5)
    val Some((w, h, c, px)) = Multimodal.PixelDecoder.decode(g)
    assert((w, h, c) == (7, 5, 3))
    val expected = idx.flatMap(i => Seq(pal(i * 3), pal(i * 3 + 1), pal(i * 3 + 2)))
    assert(px.toSeq == expected.toSeq, "palette expansion mismatch")
    // local palette variant decodes identically
    val l = gifFull(7, 5, pal, idx, minCode = 3, localPalette = true)
    assert(Multimodal.PixelDecoder.decode(l).map(_._4.toSeq) == Some(expected.toSeq))
  }

  test("GIF pixel decode: interlaced frames de-interlace to top-down rows") {
    // 2x9, row y filled with index y: interlace passes store rows
    // 0,8 / 4 / 2,6 / 1,3,5,7 — decode must restore 0..8 order
    val pal = Array.tabulate[Byte](9 * 3)(i => (i * 7).toByte) ++ new Array[Byte](21)
    val idx = Array.tabulate[Byte](18)(i => (i / 2).toByte)
    val g = gifFull(2, 9, pal, idx, minCode = 4, interlaced = true)
    val Some((w2, h2, _, px)) = Multimodal.PixelDecoder.decode(g)
    assert((w2, h2) == (2, 9))
    // reconstruct what interlaced storage looks like: stored row r is
    // display row order(r); our fixture stored rows ARE 0..8 in the
    // file, so decode must place stored row r at display row order(r)
    val order = Seq(0, 8, 4, 2, 6, 1, 3, 5, 7)
    for (r <- 0 until 9; x <- 0 until 2)
      assert(px((order(r) * 2 + x) * 3) == pal(r * 3),
        s"stored row $r should land at display row ${order(r)}")
  }

  test("GIF pixel decode: LZW stress — dictionary growth past width boundaries") {
    // 64x64 with a low-entropy pattern: dictionary crosses the 2^5,
    // 2^6 ... width boundaries; encoder and decoder must agree on the
    // growth points
    val pal = Array[Byte](0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3)
    val idx = Array.tabulate[Byte](4096)(i => ((i * i / 7) % 4).toByte)
    val g = gifFull(64, 64, pal, idx, minCode = 2)
    val Some((_, _, _, px)) = Multimodal.PixelDecoder.decode(g)
    assert(px.length == 4096 * 3)
    val got = Array.tabulate[Byte](4096)(i => px(i * 3))
    assert(got.toSeq == idx.map(i => pal(i * 3)).toSeq, "LZW stream mismatch")
  }

  test("GIF pixel decode: sub-frame composites onto the logical screen at its offset") {
    // 4x4 screen, 2x2 frame at (1,1): decoded dims must be the SCREEN
    // (matching HeaderDecoder's metadata), frame pixels at the offset,
    // the rest filled with the background color (index 0)
    val pal = Array[Byte](90, 91, 92, /**/ 10, 11, 12, /**/ 20, 21, 22, /**/ 30, 31, 32)
    val idx = Array[Byte](1, 2, 2, 1) // the 2x2 frame
    val g = gifFull(4, 4, pal, idx, minCode = 2, frame = Some((1, 1, 2, 2)))
    val Some((w, h, c, px)) = Multimodal.PixelDecoder.decode(g)
    assert((w, h, c) == (4, 4, 3))
    assert(Multimodal.HeaderDecoder.decode(g).map(m => (m._1, m._2)) == Some((4, 4)))
    def rgb(x: Int, y: Int) = (px((y * 4 + x) * 3), px((y * 4 + x) * 3 + 1), px((y * 4 + x) * 3 + 2))
    assert(rgb(0, 0) == ((90: Byte, 91: Byte, 92: Byte)), "background fill")
    assert(rgb(3, 3) == ((90: Byte, 91: Byte, 92: Byte)), "background fill")
    assert(rgb(1, 1) == ((10: Byte, 11: Byte, 12: Byte)), "frame (0,0) at offset")
    assert(rgb(2, 1) == ((20: Byte, 21: Byte, 22: Byte)))
    assert(rgb(1, 2) == ((20: Byte, 21: Byte, 22: Byte)))
    assert(rgb(2, 2) == ((10: Byte, 11: Byte, 12: Byte)))
    // a frame that overflows the screen is rejected, not blitted OOB
    assert(Multimodal.PixelDecoder.decode(
      gifFull(4, 4, pal, idx, minCode = 2, frame = Some((3, 3, 2, 2)))).isEmpty)
  }

  test("GIF pixel decode: malformed streams return None, never throw") {
    val pal = Array[Byte](0, 0, 0, 9, 9, 9)
    val idx = Array.tabulate[Byte](16)(i => (i % 2).toByte)
    val good = gifFull(4, 4, pal, idx, minCode = 2)
    import Multimodal.PixelDecoder.decode
    assert(decode(good).isDefined)
    assert(decode(good.dropRight(8)).isEmpty, "truncated data")
    assert(decode(good.take(20)).isEmpty, "header only")
    // index past the palette: a 4-entry table (size field 1) with
    // minCode 3 legal literals up to 7 — index 5 must reject, not read
    // out of the color table
    val pal4 = Array[Byte](1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4)
    val oob = Array.tabulate[Byte](16)(i => if (i == 9) 5 else (i % 2).toByte)
    assert(decode(gifFull(4, 4, pal4, oob, minCode = 3)).isEmpty)
    // header-metadata path agrees on the real file
    assert(Multimodal.HeaderDecoder.decode(good) == Some((4, 4, 3, "gif")))
  }

  test("JPEG pixel decode via the platform reader: lossy round-trip within tolerance") {
    // encode a smooth synthetic image with the SAME platform codec the
    // decoder delegates to, then check PixelDecoder's output stays
    // within JPEG-loss distance of the source pixels
    val w = 32; val h = 24
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, (x * 8 << 16) | (y * 10 << 8) | ((x + y) * 4))
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val pw = wr.getDefaultWriteParam
    pw.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    pw.setCompressionQuality(0.97f)
    wr.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    wr.write(null, new javax.imageio.IIOImage(src, null, null), pw)
    wr.dispose()
    val jpeg = bos.toByteArray
    assert(jpeg.length >= 3 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    val Some((dw, dh, dc, px)) = Multimodal.PixelDecoder.decode(jpeg)
    assert((dw, dh, dc) == (w, h, 3))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; ch <- 0 until 3) {
      val s = (src.getRGB(x, y) >> (16 - 8 * ch)) & 0xff
      val d = px((y * w + x) * 3 + ch) & 0xff
      maxDiff = math.max(maxDiff, math.abs(s - d))
    }
    assert(maxDiff <= 12, s"JPEG round-trip drifted: max channel diff $maxDiff")
    // metadata path and pixel path agree on dimensions
    assert(Multimodal.HeaderDecoder.decode(jpeg).map(m => (m._1, m._2)) == Some((w, h)))
  }

  test("PROGRESSIVE JPEG decodes and matches the baseline decode of the same image") {
    // encode the same image twice with the platform codec — baseline
    // and progressive (SOF2 scan script) — and pin that the decoder
    // handles the progressive stream: same dims, pixels within
    // re-encode distance of the baseline decode. Guards the imageio
    // delegation against a silent regression to baseline-only.
    val w = 32; val h = 24
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, (x * 8 << 16) | (y * 10 << 8) | ((x + y) * 4))
    def encode(progressive: Boolean): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val pw = wr.getDefaultWriteParam
      pw.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      pw.setCompressionQuality(0.97f)
      pw.setProgressiveMode(
        if (progressive) javax.imageio.ImageWriteParam.MODE_DEFAULT
        else javax.imageio.ImageWriteParam.MODE_DISABLED)
      wr.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
      wr.write(null, new javax.imageio.IIOImage(src, null, null), pw)
      wr.dispose()
      bos.toByteArray
    }
    val base = encode(progressive = false)
    val prog = encode(progressive = true)
    // the progressive stream really is progressive: SOF2 (0xFFC2)
    // present, and absent from the baseline stream
    def hasSof2(b: Array[Byte]) = b.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)
    assert(hasSof2(prog), "encoder did not produce a progressive scan script")
    assert(!hasSof2(base))
    val Some((bw, bh, bc, bpx)) = Multimodal.PixelDecoder.decode(base)
    val Some((pw2, ph2, pc, ppx)) = Multimodal.PixelDecoder.decode(prog)
    assert((pw2, ph2, pc) == (w, h, 3) && (bw, bh, bc) == (w, h, 3))
    // header (metadata) path reads progressive SOF2 dims too
    assert(Multimodal.HeaderDecoder.decode(prog).map(m => (m._1, m._2)) == Some((w, h)))
    var maxDiff = 0
    for (i <- bpx.indices)
      maxDiff = math.max(maxDiff, math.abs((bpx(i) & 0xff) - (ppx(i) & 0xff)))
    assert(maxDiff <= 8, s"progressive decode drifted from baseline: max diff $maxDiff")
  }

  test("JPEG pixel decode: real files — color 3-channel, grayscale 1-channel") {
    import java.nio.file.{Files, Paths}
    val kitten = Paths.get("/opt/spark/data/mllib/images/origin/kittens/DP802813.jpg")
    val gray = Paths.get("/opt/spark/data/mllib/images/origin/multi-channel/grayscale.jpg")
    assume(Files.exists(kitten) && Files.exists(gray), "spark sample images not present")
    val Some((kw, kh, kc, kpx)) = Multimodal.PixelDecoder.decode(Files.readAllBytes(kitten))
    assert((kw, kh, kc) == (199, 313, 3) && kpx.length == 199 * 313 * 3)
    val Some((gw, gh, gc, gpx)) = Multimodal.PixelDecoder.decode(Files.readAllBytes(gray))
    assert((gw, gh, gc) == (300, 215, 1) && gpx.length == 300 * 215)
    // real photos are not flat: decoded rasters must carry variation
    assert(kpx.distinct.length > 16 && gpx.distinct.length > 16)
  }

  test("JPEG pixel decode: crafted dims rejected before the reader allocates") {
    // FF D8 + a SOF0 claiming 65535x65535: the header pre-guard must
    // return None without handing the payload to ImageIO
    val sof = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xc0.toByte,
      0, 17, 8, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    assert(Multimodal.PixelDecoder.decode(sof).isEmpty)
    // JPEG magic with no SOF at all (EOI immediately)
    assert(Multimodal.PixelDecoder.decode(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)).isEmpty)
  }

  /** One animated-GIF frame spec: rect geometry + indices + its GCE
    * (disposal method, transparent index or -1). */
  private case class AnimFrame(left: Int, top: Int, w: Int, h: Int,
      indices: Array[Byte], disposal: Int, transIdx: Int = -1)

  /** Assemble a multi-frame GIF89a: global palette, one GCE + image
    * descriptor per frame. */
  private def gifAnim(sw: Int, sh: Int, palette: Array[Byte], bgIndex: Int,
      frames: Seq[AnimFrame], minCode: Int = 2): Array[Byte] = {
    require(palette.length % 3 == 0)
    val palBits = {
      var n = 1
      while (3 * (1 << (n + 1)) < palette.length) n += 1
      n
    }
    val palPadded = palette ++ new Array[Byte](3 * (1 << (palBits + 1)) - palette.length)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    le16(sw); le16(sh)
    bos.write(0x80 | palBits)
    bos.write(bgIndex); bos.write(0)
    bos.write(palPadded)
    for (f <- frames) {
      bos.write(0x21); bos.write(0xf9); bos.write(4) // GCE
      bos.write((f.disposal << 2) | (if (f.transIdx >= 0) 1 else 0))
      bos.write(0); bos.write(0) // delay
      bos.write(if (f.transIdx >= 0) f.transIdx else 0)
      bos.write(0) // terminator
      bos.write(0x2c)
      le16(f.left); le16(f.top); le16(f.w); le16(f.h)
      bos.write(0) // no local palette, not interlaced
      bos.write(minCode)
      val z = lzwEncode(f.indices, minCode)
      var off = 0
      while (off < z.length) {
        val n = math.min(255, z.length - off)
        bos.write(n); bos.write(z, off, n)
        off += n
      }
      bos.write(0)
    }
    bos.write(0x3b)
    bos.toByteArray
  }

  test("animated GIF: disposal methods compose frame N's canvas correctly") {
    // palette: 0=bg(5,6,7) 1=red-ish 2=green-ish 3=blue-ish
    val pal = Array[Byte](5, 6, 7, /**/ 100, 0, 0, /**/ 0, 100, 0, /**/ 0, 0, 100)
    def rgbAt(px: Array[Byte], sw: Int, x: Int, y: Int) =
      (px((y * sw + x) * 3), px((y * sw + x) * 3 + 1), px((y * sw + x) * 3 + 2))
    val g = gifAnim(4, 4, pal, bgIndex = 0, frames = Seq(
      // frame 0: full screen of color 1, disposal 1 (leave)
      AnimFrame(0, 0, 4, 4, Array.fill[Byte](16)(1), disposal = 1),
      // frame 1: 2x2 color-2 patch at (1,1) with one TRANSPARENT pixel,
      // disposal 2 (restore rect to background afterwards)
      AnimFrame(1, 1, 2, 2, Array[Byte](2, 3, 3, 2), disposal = 2, transIdx = 3),
      // frame 2: 1x1 color-3 at (0,0), disposal 3 (restore previous)
      AnimFrame(0, 0, 1, 1, Array[Byte](3), disposal = 3),
      // frame 3: fully transparent 1x1 — canvas must equal the
      // post-disposal state of frame 2
      AnimFrame(3, 3, 1, 1, Array[Byte](3), disposal = 0, transIdx = 3)))
    val Some((sw, sh, frames)) = Multimodal.PixelDecoder.gifFrames(g, maxFrames = 16)
    assert((sw, sh) == (4, 4) && frames.length == 4)
    val c1 = ((100: Byte), (0: Byte), (0: Byte))
    val c2 = ((0: Byte), (100: Byte), (0: Byte))
    val bg = ((5: Byte), (6: Byte), (7: Byte))
    // frame 0: all color 1
    for (x <- 0 until 4; y <- 0 until 4)
      assert(rgbAt(frames(0).canvas, 4, x, y) == c1)
    // frame 1: color 2 at (1,1) and (2,2); transparent at (2,1)/(1,2)
    // leaves frame 0's color 1 underneath
    assert(rgbAt(frames(1).canvas, 4, 1, 1) == c2)
    assert(rgbAt(frames(1).canvas, 4, 2, 2) == c2)
    assert(rgbAt(frames(1).canvas, 4, 2, 1) == c1, "transparent pixel must not overdraw")
    assert(rgbAt(frames(1).canvas, 4, 1, 2) == c1)
    assert(rgbAt(frames(1).canvas, 4, 0, 0) == c1)
    // frame 1's rgba rect: alpha 0 exactly at the transparent pixels
    assert(frames(1).rgba.grouped(4).map(_(3)).toSeq == Seq(-1, 0, 0, -1).map(_.toByte))
    // frame 2: disposal 2 of frame 1 restored its RECT to bg first
    assert(rgbAt(frames(2).canvas, 4, 1, 1) == bg, "frame 1 rect restored to background")
    assert(rgbAt(frames(2).canvas, 4, 2, 2) == bg)
    assert(rgbAt(frames(2).canvas, 4, 0, 0) == ((0: Byte), (0: Byte), (100: Byte)))
    assert(rgbAt(frames(2).canvas, 4, 3, 3) == c1, "outside both rects: frame 0 pixels stay")
    // frame 3: disposal 3 undid frame 2's pixel; fully-transparent
    // frame 3 draws nothing
    assert(rgbAt(frames(3).canvas, 4, 0, 0) == c1, "restore-previous undid frame 2")
    assert(frames(3).canvas.toSeq == {
      val expect = frames(1).canvas.clone()
      // frame 1's disposal-2 rect restore, then nothing else drawn
      for (y <- 1 to 2; x <- 1 to 2) {
        expect((y * 4 + x) * 3) = 5; expect((y * 4 + x) * 3 + 1) = 6
        expect((y * 4 + x) * 3 + 2) = 7
      }
      expect.toSeq
    })
    // decode() == first composited frame (the pinned single-frame path)
    assert(Multimodal.PixelDecoder.decode(g).map(_._4.toSeq) ==
      Some(frames(0).canvas.toSeq))
  }

  test("animated GIF: per-frame rects agree pixel-exact with the platform reader") {
    val pal = Array[Byte](5, 6, 7, /**/ 100, 0, 0, /**/ 0, 100, 0, /**/ 0, 0, 100)
    val g = gifAnim(5, 4, pal, bgIndex = 0, frames = Seq(
      AnimFrame(0, 0, 5, 4, Array.tabulate[Byte](20)(i => (i % 4).toByte), disposal = 1),
      AnimFrame(2, 1, 3, 2, Array[Byte](1, 2, 3, 3, 2, 1), disposal = 2, transIdx = 2),
      AnimFrame(1, 0, 2, 3, Array[Byte](0, 1, 2, 3, 0, 1), disposal = 3)))
    val Some((_, _, ours)) = Multimodal.PixelDecoder.gifFrames(g, maxFrames = 16)
    assert(ours.length == 3)

    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(g))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 3)
    for (k <- 0 until 3) {
      val img = reader.read(k)
      val f = ours(k)
      assert((img.getWidth, img.getHeight) == (f.width, f.height), s"frame $k dims")
      val argb = img.getRGB(0, 0, f.width, f.height, null, 0, f.width)
      for (p <- argb.indices) {
        val a = (argb(p) >>> 24).toByte
        assert(f.rgba(p * 4 + 3) == a, s"frame $k pixel $p alpha")
        if (a != 0) {
          assert(f.rgba(p * 4) == (argb(p) >> 16).toByte &&
            f.rgba(p * 4 + 1) == (argb(p) >> 8).toByte &&
            f.rgba(p * 4 + 2) == argb(p).toByte,
            s"frame $k pixel $p differs from the platform decode")
        }
      }
    }
    reader.dispose()
  }

  test("gifFramePixels operator: one row per composited frame; corrupt payloads drop") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val pal = Array[Byte](5, 6, 7, /**/ 100, 0, 0, /**/ 0, 100, 0, /**/ 0, 0, 100)
    val g = gifAnim(3, 3, pal, bgIndex = 0, frames = Seq(
      AnimFrame(0, 0, 3, 3, Array.fill[Byte](9)(1), disposal = 1),
      AnimFrame(0, 0, 1, 1, Array[Byte](2), disposal = 1),
      AnimFrame(2, 2, 1, 1, Array[Byte](3), disposal = 1)))
    val df = Seq(
      (1L, g),
      (2L, "not a gif".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val out = Multimodal.gifFramePixels(df, "id", "payload", maxFrames = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq == Seq((1L, 0, 3, 3), (1L, 1, 3, 3), (1L, 2, 3, 3)))
    // stride sampling keeps frames 0 and 2
    val strided = Multimodal.gifFramePixels(df, "id", "payload", maxFrames = 16, every = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(strided.toSeq == Seq((1L, 0), (1L, 2)))
  }

  test("hand-rolled GIF decode agrees pixel-exact with the platform reader on real files") {
    import java.nio.file.{Files, Paths}
    val files = Seq(
      "/usr/share/doc/libxslt1-dev/html/processing.gif",
      "/usr/share/doc/libxslt1-dev/html/node.gif",
      "/usr/share/doc/libxslt1-dev/html/templates.gif").map(Paths.get(_))
    assume(files.forall(Files.exists(_)), "libxslt doc gifs not present")
    for (f <- files) {
      val bytes = Files.readAllBytes(f)
      val Some((w, h, c, px)) = Multimodal.PixelDecoder.decode(bytes)
      assert(c == 3)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert((w, h) == (ref.getWidth, ref.getHeight))
      val argb = ref.getRGB(0, 0, w, h, null, 0, w)
      var i = 0
      while (i < argb.length) {
        val v = argb(i)
        assert(px(i * 3) == (v >> 16).toByte && px(i * 3 + 1) == (v >> 8).toByte &&
          px(i * 3 + 2) == v.toByte, s"$f pixel $i differs from the platform decode")
        i += 1
      }
    }
  }

  test("unknown/truncated payloads return None (fallback path)") {
    assert(Multimodal.HeaderDecoder.decode("plain utf-8 text payload".getBytes).isEmpty)
    assert(Multimodal.HeaderDecoder.decode(Array[Byte](0x89.toByte, 'P')).isEmpty)
    assert(Multimodal.HeaderDecoder.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(Multimodal.HeaderDecoder.decode(Array.empty[Byte]).isEmpty)
    // decodeMeta falls back deterministically
    val (w, h, c, f) = Multimodal.decodeMeta("abc".getBytes)
    assert(w == 35 && h == 53 && c == 3 && f == "jpeg")
  }
}
