package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM codec unit tests — no Spark session needed. */
class MediaCodecsSpec extends AnyFunSuite {

  test("BMP round-trip: header facts and padded-row mean") {
    // width 5 → row bytes 15, padded to 16: one zero pad byte per row
    // that must NOT reach the mean
    val w = 5; val h = 3
    val bytes = MediaCodecs.encodeBmp(w, h, k => (k % 7).toInt)
    assert(MediaCodecs.bmpRowSize(w) == 16)
    assert(bytes.length == 54 + 16 * h)
    val d = MediaCodecs.decode(bytes)
    assert(d.format == "bmp" && d.width == w && d.height == h && d.channels == 3)
    val expected = (0L until 3L * w * h).map(k => (k % 7).toDouble).sum / (3 * w * h)
    assert(math.abs(d.meanVal - expected) < 1e-12)
  }

  test("BMP: a mean that included padding bytes would differ") {
    // all-255 pixels with nonzero padding rows: true mean is 255; a
    // decoder averaging raw raster bytes would see the zero pads
    val w = 5; val h = 2
    val bytes = MediaCodecs.encodeBmp(w, h, _ => 255)
    assert(MediaCodecs.decode(bytes).meanVal == 255.0)
  }

  test("BMP: negative height (top-down storage) decodes") {
    val w = 4; val h = 2
    val bytes = MediaCodecs.encodeBmp(w, h, k => k.toInt)
    // flip the stored height to -h (little-endian at offset 22)
    val neg = -h
    bytes(22) = (neg & 0xFF).toByte
    bytes(23) = ((neg >> 8) & 0xFF).toByte
    bytes(24) = ((neg >> 16) & 0xFF).toByte
    bytes(25) = ((neg >> 24) & 0xFF).toByte
    val d = MediaCodecs.decode(bytes)
    assert(d.height == h && d.width == w)
  }

  test("resizeImage: top-down BMP samples the same logical pixels as bottom-up") {
    // flip matters for resize (which rows get sampled), unlike the
    // flip-invariant mean checks — pin both storage orders byte-equal
    val w = 6; val h = 4
    def pix(k: Long): Int = ((k * 13 + 5) % 256).toInt
    val bottomUp = MediaCodecs.encodeBmp(w, h, pix)
    // top-down twin: negate stored height AND reverse the row order
    val topDown = bottomUp.clone()
    val neg = -h
    topDown(22) = (neg & 0xFF).toByte
    topDown(23) = ((neg >> 8) & 0xFF).toByte
    topDown(24) = ((neg >> 16) & 0xFF).toByte
    topDown(25) = ((neg >> 24) & 0xFF).toByte
    val rowSize = MediaCodecs.bmpRowSize(w)
    for (y <- 0 until h; i <- 0 until rowSize)
      topDown(54 + y * rowSize + i) = bottomUp(54 + (h - 1 - y) * rowSize + i)
    val a = MediaCodecs.resizeImage(bottomUp, 3, 2).get
    val b = MediaCodecs.resizeImage(topDown, 3, 2).get
    assert(a.toSeq == b.toSeq)
    // and the resample itself is the closed-form map of pix()
    val d = MediaCodecs.decode(a)
    val expected = (0 until 3 * 3 * 2).map { k =>
      val c = k % 3; val x = (k / 3) % 3; val y = k / 9
      pix(((y * h / 2) * w + (x * w / 3)) * 3 + c).toDouble
    }
    assert(d.meanVal == expected.sum / expected.size)
  }

  test("resizeImage: corrupt image-sniffing payload rejects; resizeMedia quarantines it") {
    val corrupt = "BMgarbage-not-a-real-header".getBytes("US-ASCII")
    intercept[IllegalArgumentException](
      MediaCodecs.resizeImage(corrupt, 4, 4))
  }

  test("PPM round-trip incl. multi-digit dimensions in the ASCII header") {
    val w = 12; val h = 10
    val bytes = MediaCodecs.encodePpm(w, h, k => ((k * 3) % 251).toInt)
    assert(bytes.length == 9 + 2 + 2 + 3 * w * h) // "P6\n12 10\n255\n"
    val d = MediaCodecs.decode(bytes)
    assert(d.format == "ppm" && d.width == w && d.height == h)
    val expected = (0L until 3L * w * h).map(k => ((k * 3) % 251).toDouble).sum / (3 * w * h)
    assert(math.abs(d.meanVal - expected) < 1e-12)
  }

  test("WAV round-trip: stereo frames, signed samples, duration") {
    val frames = 100L
    val bytes = MediaCodecs.encodeWav(2, 8000, frames, k => (k % 401 - 200).toInt)
    assert(bytes.length == 44 + 2 * 2 * frames)
    val d = MediaCodecs.decode(bytes)
    assert(d.format == "wav" && d.channels == 2 && d.sampleRate == 8000)
    assert(d.nFrames == frames)
    val n = 2 * frames
    val expected = (0L until n).map(k => (k % 401 - 200).toDouble).sum / n
    assert(math.abs(d.meanVal - expected) < 1e-12)
  }

  test("WAV: unknown chunks before fmt/data are skipped (odd-size padded)") {
    // hand-build: RIFF [junk chunk of size 3 + pad] [fmt] [data]
    val base = MediaCodecs.encodeWav(1, 8000, 4L, _ => 100)
    val fmtAndData = base.drop(12)
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val body = junk ++ fmtAndData
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val size = 4 + body.length
    out.write(Array[Byte]((size & 0xFF).toByte, ((size >> 8) & 0xFF).toByte,
      ((size >> 16) & 0xFF).toByte, ((size >> 24) & 0xFF).toByte))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write(body)
    val d = MediaCodecs.decode(out.toByteArray)
    assert(d.nFrames == 4L && d.meanVal == 100.0)
  }

  test("decode dispatches on magic bytes and rejects unknown containers") {
    assert(MediaCodecs.decode(MediaCodecs.encodeBmp(2, 2, _ => 1)).format == "bmp")
    assert(MediaCodecs.decode(MediaCodecs.encodePpm(2, 2, _ => 1)).format == "ppm")
    assert(MediaCodecs.decode(MediaCodecs.encodeWav(1, 100, 1, _ => 1)).format == "wav")
    intercept[IllegalArgumentException] {
      MediaCodecs.decode("not media at all".getBytes("UTF-8"))
    }
  }

  test("WAV: negative chunk size rejects instead of stalling the walk") {
    val wav = MediaCodecs.encodeWav(1, 8000, 4, _ => 1)
    // corrupt the fmt chunk's size field (offset 16, LE) to -8: an
    // unchecked walk would loop forever on off += 8 + size
    wav(16) = 0xF8.toByte; wav(17) = 0xFF.toByte
    wav(18) = 0xFF.toByte; wav(19) = 0xFF.toByte
    intercept[IllegalArgumentException] { MediaCodecs.decode(wav) }
  }

  test("BMP: negative width in the header rejects, not AIOOBE/garbage") {
    val bmp = MediaCodecs.encodeBmp(4, 2, _ => 1)
    val w = -4
    bmp(18) = (w & 0xFF).toByte; bmp(19) = ((w >> 8) & 0xFF).toByte
    bmp(20) = ((w >> 16) & 0xFF).toByte; bmp(21) = ((w >> 24) & 0xFF).toByte
    intercept[IllegalArgumentException] { MediaCodecs.decode(bmp) }
  }

  test("WAV: chunk size near Int.MaxValue rejects, not Int-wrap AIOOBE") {
    // fmt chunk size 0x7FFFFFF0: in Int arithmetic the walk offset
    // `off += 8 + size + (size & 1)` wraps negative, re-enters the
    // loop (the negative offset still satisfies `off + 8 <= length`),
    // and throws an index error from the header read; the Long walk
    // steps past the buffer and the missing-data require fires.
    val wav = MediaCodecs.encodeWav(1, 8000, 4, _ => 1)
    wav(16) = 0xF0.toByte; wav(17) = 0xFF.toByte
    wav(18) = 0xFF.toByte; wav(19) = 0x7F.toByte
    val e = intercept[IllegalArgumentException] { MediaCodecs.decode(wav) }
    assert(e.getMessage.contains("data chunk"), e.getMessage)
  }

  test("WAV: data size overflowing dataOff+dataLen rejects, not AIOOBE") {
    // data chunk size 0x7FFFFFFF at a small offset: an Int-typed
    // truncation check `bytes.length >= dataOff + dataLen` wraps
    // negative and PASSES, and the PCM loop then reads out of bounds;
    // the Long-side bound rejects it as truncated.
    val wav = MediaCodecs.encodeWav(1, 8000, 4, _ => 1)
    val dataSizeOff = wav.length - 8 - 4 // size field of the data chunk
    wav(dataSizeOff) = 0xFF.toByte; wav(dataSizeOff + 1) = 0xFF.toByte
    wav(dataSizeOff + 2) = 0xFF.toByte; wav(dataSizeOff + 3) = 0x7F.toByte
    val e = intercept[IllegalArgumentException] { MediaCodecs.decode(wav) }
    assert(e.getMessage.contains("data chunk"), e.getMessage)
  }

  test("aHash: bright cells set bits, container-independent, audio None") {
    // 8×8 image, left half bright (200,200,200), right half dark
    // (10,10,10): with a 4×4 grid, columns 0-1 of every cell row are
    // above the global mean, columns 2-3 below
    def pix(k: Long): Int = {
      val pixel = k / 3
      val x = (pixel % 8).toInt
      if (x < 4) 200 else 10
    }
    val expected = (0 until 16).map { c =>
      if (c % 4 < 2) 1L << c else 0L
    }.sum
    val bmp = MediaCodecs.aHashBits(MediaCodecs.encodeBmp(8, 8, pix), 4)
    val ppm = MediaCodecs.aHashBits(MediaCodecs.encodePpm(8, 8, pix), 4)
    assert(bmp.contains(expected), s"bmp $bmp != $expected")
    // the SAME logical pixels must hash identically through either
    // container — bottom-up padded BMP rows vs raw PPM raster
    assert(ppm == bmp)
    // audio has no raster
    assert(MediaCodecs.aHashBits(MediaCodecs.encodeWav(1, 8000, 4, _ => 1), 4).isEmpty)
    // grid larger than the raster rejects instead of emitting empty cells
    intercept[IllegalArgumentException] {
      MediaCodecs.aHashBits(MediaCodecs.encodeBmp(5, 4, pix), 8)
    }
  }

  test("aHash: uniform image hashes to zero (no cell strictly above the mean)") {
    val flat = MediaCodecs.encodePpm(8, 8, _ => 77)
    assert(MediaCodecs.aHashBits(flat, 4).contains(0L))
  }

  test("audioFingerprint: loud cells set bits, images None, tiny stream rejects") {
    // 64 mono samples: first half loud (±900), second half quiet (±3)
    // → with 8 cells, cells 0-3 above the stream mean, 4-7 below
    def smp(k: Long): Int = {
      val mag = if (k < 32) 900 else 3
      if (k % 2 == 0) mag else -mag  // sign must not matter (|x|)
    }
    val wav = MediaCodecs.encodeWav(1, 8000, 64, smp)
    val expected = (0 until 4).map(1L << _).sum
    assert(MediaCodecs.audioFingerprintBits(wav, 8).contains(expected))
    // images have no PCM stream
    assert(MediaCodecs.audioFingerprintBits(
      MediaCodecs.encodeBmp(4, 4, _ => 9), 8).isEmpty)
    assert(MediaCodecs.audioFingerprintBits(
      MediaCodecs.encodePpm(4, 4, _ => 9), 8).isEmpty)
    // a stream shorter than the cell count rejects instead of
    // emitting empty cells
    intercept[IllegalArgumentException] {
      MediaCodecs.audioFingerprintBits(MediaCodecs.encodeWav(1, 8000, 4, _ => 1), 8)
    }
  }

  test("sniffFormat: one authority for magic bytes, partial magics rejected") {
    assert(MediaCodecs.sniffFormat(MediaCodecs.encodeBmp(4, 4, _ => 9)).contains("bmp"))
    assert(MediaCodecs.sniffFormat(MediaCodecs.encodePpm(4, 4, _ => 9)).contains("ppm"))
    assert(MediaCodecs.sniffFormat(MediaCodecs.encodeWav(1, 8000, 4, _ => 1)).contains("wav"))
    // a stray text blob starting with 'B' (or 'P5', or 'RIF') is NOT
    // a container — the hash operators must agree with decode()'s
    // quarantine, not silently label it
    assert(MediaCodecs.sniffFormat("BEGIN cert".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodecs.sniffFormat("P5 gray".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodecs.sniffFormat("RIX".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodecs.aHashBits("BEGIN cert".getBytes("US-ASCII"), 4).isEmpty)
    assert(MediaCodecs.audioFingerprintBits("RIX".getBytes("US-ASCII"), 4).isEmpty)
  }

  test("audioFingerprint: constant-magnitude stream hashes to zero") {
    // |x| identical everywhere → no cell strictly above the mean
    val flat = MediaCodecs.encodeWav(2, 8000, 32, k => if (k % 2 == 0) 55 else -55)
    assert(MediaCodecs.audioFingerprintBits(flat, 8).contains(0L))
  }

  test("truncated payloads are rejected, not silently mis-decoded") {
    val bmp = MediaCodecs.encodeBmp(4, 4, _ => 9)
    intercept[IllegalArgumentException] { MediaCodecs.decode(bmp.take(60)) }
    val ppm = MediaCodecs.encodePpm(4, 4, _ => 9)
    intercept[IllegalArgumentException] { MediaCodecs.decode(ppm.take(12)) }
    val wav = MediaCodecs.encodeWav(1, 8000, 10, _ => 9)
    intercept[IllegalArgumentException] { MediaCodecs.decode(wav.take(50)) }
  }

  // ---- PNG / JPEG (JDK javax.imageio) ----------------------------------

  private def pix(k: Long): Int = ((k * 31 + 7) % 256).toInt

  test("PNG round-trip: lossless — decoded mean equals the raster closed form") {
    val (w, h) = (11, 7)
    val bytes = MediaCodecs.encodePng(w, h, pix)
    assert(MediaCodecs.sniffFormat(bytes).contains("png"))
    val d = MediaCodecs.decode(bytes)
    assert(d.format == "png" && d.width == w && d.height == h && d.channels == 3)
    val n = 3L * w * h
    val expected = (0L until n).map(pix(_).toLong).sum.toDouble / n
    assert(d.meanVal == expected) // EXACT: PNG is lossless
  }

  test("PNG and PPM of the same raster agree on decode, aHash, and resize bytes") {
    val (w, h) = (9, 8)
    val png = MediaCodecs.encodePng(w, h, pix)
    val ppmb = MediaCodecs.encodePpm(w, h, pix)
    // same logical raster through two container walks (ours vs JDK)
    assert(MediaCodecs.decode(png).meanVal == MediaCodecs.decode(ppmb).meanVal)
    assert(MediaCodecs.aHashBits(png, 4) == MediaCodecs.aHashBits(ppmb, 4))
    // the resize re-encodes PPM from the logical raster, so the two
    // source containers must produce IDENTICAL output bytes
    val rp = MediaCodecs.resizeImage(png, 5, 3).get
    val rq = MediaCodecs.resizeImage(ppmb, 5, 3).get
    assert(java.util.Arrays.equals(rp, rq))
  }

  test("grayscale PNG reports its native channel count, not a hardcoded 3") {
    // the ADVICE r9 finding: a real web corpus carries gray/palette
    // PNGs — the container fact must reflect the color model
    val (w, h) = (6, 5)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = pix((y.toLong * w + x) * 3)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val d = MediaCodecs.decode(out.toByteArray)
    assert(d.format == "png" && d.width == w && d.height == h)
    assert(d.channels == 1, s"grayscale PNG must report 1 channel, got ${d.channels}")
    // the mean stays the deterministic sRGB-converted view (the raw
    // gray byte is NOT pinned: TYPE_BYTE_GRAY's linear-gray→sRGB
    // conversion is not identity — a known AWT behavior)
    assert(d.meanVal >= 0.0 && d.meanVal <= 255.0)
    assert(MediaCodecs.decode(out.toByteArray).meanVal == d.meanVal)
  }

  test("RGBA and palette PNGs pin the alpha-excluded channel contract") {
    // the ADVICE r10 finding: getNumComponents counts alpha (RGBA→4)
    // and IndexColorModel components (palette→varies) — the contract
    // is COLOR-SPACE components: RGBA 3 (alpha excluded), palette 3
    // (entries are RGB triples; the index is an encoding detail)
    val (w, h) = (6, 5)
    val rgba = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      rgba.setRGB(x, y, 0x80000000 | (x * 40 << 16) | (y * 50 << 8) | 7)
    val outA = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgba, "png", outA)
    val dA = MediaCodecs.decode(outA.toByteArray)
    assert(dA.format == "png" && dA.width == w && dA.height == h)
    assert(dA.channels == 3,
      s"RGBA PNG must report 3 color channels (alpha excluded), got ${dA.channels}")
    // palette (indexed) PNG: 4-entry RGB palette, byte-indexed raster
    val cmap = Array(0xFF000000, 0xFFFF0000, 0xFF00FF00, 0xFF0000FF)
    val icm = new java.awt.image.IndexColorModel(2, 4,
      cmap, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val pal = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w) pal.setRGB(x, y, cmap((x + y) % 4))
    val outP = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(pal, "png", outP)
    val dP = MediaCodecs.decode(outP.toByteArray)
    assert(dP.format == "png" && dP.width == w && dP.height == h)
    assert(dP.channels == 3,
      s"palette PNG must report 3 color channels (RGB palette entries), got ${dP.channels}")
  }

  test("JPEG: deterministic dims/channels through the JDK codec (lossy: no mean pin)") {
    val (w, h) = (16, 12)
    val bytes = MediaCodecs.encodeJpeg(w, h, pix)
    assert(MediaCodecs.sniffFormat(bytes).contains("jpeg"))
    val d = MediaCodecs.decode(bytes)
    assert(d.format == "jpeg" && d.width == w && d.height == h && d.channels == 3)
    assert(d.meanVal >= 0.0 && d.meanVal <= 255.0)
    // decode of the SAME payload is deterministic
    assert(MediaCodecs.decode(bytes).meanVal == d.meanVal)
    // resize + aHash arms accept it
    assert(MediaCodecs.resizeImage(bytes, 4, 4).isDefined)
    assert(MediaCodecs.aHashBits(bytes, 4).isDefined)
  }

  test("corrupt PNG/JPEG payloads quarantine as IllegalArgumentException") {
    val png = MediaCodecs.encodePng(8, 8, pix)
    // valid signature + garbage body: ImageIO failure modes must all
    // surface as IAE (the class resizeMedia's per-row quarantine catches)
    val sigOnly = png.take(8) ++ "garbage-after-signature".getBytes("US-ASCII")
    intercept[IllegalArgumentException] { MediaCodecs.decode(sigOnly) }
    intercept[IllegalArgumentException] { MediaCodecs.decode(png.take(20)) }
    val jpg = MediaCodecs.encodeJpeg(8, 8, pix)
    intercept[IllegalArgumentException] { MediaCodecs.decode(jpg.take(6)) }
  }
}
