package graft.ops

import java.io.ByteArrayOutputStream

/** Self-contained pure-JVM media codecs: 24-bit BMP, binary PPM (P6),
  * and 16-bit PCM WAV parsed byte-for-byte, plus PNG and JPEG through
  * the JDK's own `javax.imageio` plugins (shipped with every JRE — no
  * external libraries, works offline). The byte-parsed containers are
  * the ones simple enough to walk by hand; PNG/JPEG are the containers
  * a real web corpus actually carries, and PNG being lossless keeps
  * its decoded raster oracle-replayable bit-for-bit.
  *
  * Encoders exist so the pipeline can synthesize deterministic
  * payloads for the fixture corpus (the test tables carry no binary
  * media column); decoders detect the container from magic bytes and
  * never trust caller-supplied metadata.
  */
object MediaCodecs {

  /** Decoded container facts. Images: channels=3, sampleRate=0,
    * nFrames=0, meanVal = mean pixel byte (0..255). WAV: width=height=0,
    * nFrames = per-channel sample frames, meanVal = mean signed sample.
    */
  case class Decoded(format: String, width: Int, height: Int,
      channels: Int, sampleRate: Int, nFrames: Long, meanVal: Double)

  // ---- little-endian helpers -------------------------------------------

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
  }
  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }
  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  // ---- BMP (BITMAPINFOHEADER, 24bpp, BI_RGB) ---------------------------

  /** Bytes per stored BMP row: 3·width rounded up to a 4-byte boundary. */
  def bmpRowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** 24-bit uncompressed BMP. `pix(k)` supplies the pixel byte at
    * logical index k = (y·width + x)·3 + c with y the TOP-DOWN row —
    * rows are stored bottom-up with zero padding, as the format requires.
    */
  def encodeBmp(width: Int, height: Int, pix: Long => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = bmpRowSize(width)
    val dataSize = rowSize * height
    val out = new ByteArrayOutputStream(54 + dataSize)
    out.write('B'); out.write('M')
    le32(out, 54 + dataSize) // file size
    le32(out, 0)             // reserved
    le32(out, 54)            // pixel data offset
    le32(out, 40)            // BITMAPINFOHEADER size
    le32(out, width)
    le32(out, height)        // positive → bottom-up
    le16(out, 1)             // planes
    le16(out, 24)            // bpp
    le32(out, 0)             // BI_RGB
    le32(out, dataSize)
    le32(out, 2835); le32(out, 2835) // 72 DPI
    le32(out, 0); le32(out, 0)       // palette
    var y = height - 1
    while (y >= 0) {
      var i = 0
      while (i < 3 * width) {
        out.write(pix(y.toLong * width * 3 + i) & 0xFF)
        i += 1
      }
      var p = 3 * width
      while (p < rowSize) { out.write(0); p += 1 } // padding NOT pixel data
      y -= 1
    }
    out.toByteArray
  }

  /** Validated 24-bit BMP header facts: pixel-data offset, logical
    * dimensions, whether rows are stored top-down (negative stored
    * height), and the padded stored row size.
    */
  private case class BmpHeader(dataOffset: Int, width: Int, height: Int,
      topDown: Boolean, rowSize: Int)

  /** Shared BMP header parse + validation (decode and aHash paths —
    * one copy of every hardening check, mirroring parseWavPcm).
    */
  private def parseBmpHeader(bytes: Array[Byte]): BmpHeader = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val dataOffset = readLe32(bytes, 10)
    val width = readLe32(bytes, 18)
    val rawHeight = readLe32(bytes, 22)
    val height = math.abs(rawHeight)
    val bpp = readLe16(bytes, 28)
    // corrupt headers must REJECT, not index out of bounds or return
    // plausible garbage (negative width flips the truncation check's
    // sign and would otherwise sail through)
    require(width > 0 && height > 0 && dataOffset >= 54,
      s"corrupt BMP header (w=$width h=$height off=$dataOffset)")
    require(bpp == 24, s"unsupported BMP bpp $bpp (24-bit only)")
    require(readLe32(bytes, 30) == 0, "compressed BMP unsupported")
    val rowSize = bmpRowSize(width)
    require(bytes.length >= dataOffset + rowSize.toLong * height, "truncated BMP")
    BmpHeader(dataOffset, width, height, topDown = rawHeight < 0, rowSize)
  }

  /** Parse a 24-bit BMP: header-driven data offset, per-row padding
    * skipped (padding bytes must NOT contaminate the mean), negative
    * height (top-down storage) accepted.
    */
  def decodeBmp(bytes: Array[Byte]): Decoded = {
    val h = parseBmpHeader(bytes)
    var sum = 0L
    var y = 0
    while (y < h.height) {
      val rowOff = h.dataOffset + y * h.rowSize
      var i = 0
      while (i < 3 * h.width) { sum += bytes(rowOff + i) & 0xFF; i += 1 }
      y += 1
    }
    val n = 3L * h.width * h.height
    Decoded("bmp", h.width, h.height, 3, 0, 0L,
      if (n == 0) 0.0 else sum.toDouble / n)
  }

  // ---- PPM (P6 binary) -------------------------------------------------

  /** Binary PPM: ASCII header `P6\n<w> <h>\n255\n` + raw RGB raster
    * (no row padding — the contrast with BMP is what the decode specs
    * exercise). Same `pix(k)` convention as [[encodeBmp]].
    */
  def encodePpm(width: Int, height: Int, pix: Long => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new ByteArrayOutputStream(header.length + 3 * width * height)
    out.write(header, 0, header.length)
    var k = 0L
    val total = 3L * width * height
    while (k < total) { out.write(pix(k) & 0xFF); k += 1 }
    out.toByteArray
  }

  /** Validated P6 header facts: dimensions + raster start offset. */
  private case class PpmHeader(width: Int, height: Int, rasterOff: Int)

  /** Shared P6 header parse + validation: whitespace-tokenized header
    * (width, height, maxval), exactly one whitespace byte before the
    * raster, truncation-checked against 3·w·h raster bytes.
    */
  private def parsePpmHeader(bytes: Array[Byte]): PpmHeader = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var off = 2
    def nextInt(): Int = {
      while (off < bytes.length && Character.isWhitespace(bytes(off))) off += 1
      var v = 0
      require(off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9', "bad PPM header")
      while (off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9') {
        v = v * 10 + (bytes(off) - '0'); off += 1
      }
      v
    }
    val width = nextInt()
    val height = nextInt()
    val maxval = nextInt()
    require(width > 0 && height > 0, s"corrupt PPM header (w=$width h=$height)")
    require(maxval == 255, s"unsupported PPM maxval $maxval")
    off += 1 // the single whitespace separating header from raster
    require(bytes.length >= off + 3L * width * height, "truncated PPM")
    PpmHeader(width, height, off)
  }

  /** Parse P6 container facts + mean pixel byte. */
  def decodePpm(bytes: Array[Byte]): Decoded = {
    val h = parsePpmHeader(bytes)
    val n = 3L * h.width * h.height
    var sum = 0L
    var i = 0L
    while (i < n) { sum += bytes(h.rasterOff + i.toInt) & 0xFF; i += 1 }
    Decoded("ppm", h.width, h.height, 3, 0, 0L,
      if (n == 0) 0.0 else sum.toDouble / n)
  }

  // ---- perceptual hash (average hash) ----------------------------------

  /** grid×grid average-hash over the grayscale raster: bit (i·grid+j)
    * is set iff cell (i,j)'s mean gray STRICTLY exceeds the image
    * mean. Gray = r+g+b unnormalized (the scale cancels in the
    * comparison), cells partition the TOP-DOWN raster at integer
    * boundaries (y·grid/h, x·grid/w), and every comparison is
    * EXACT-INTEGER (BigInt cross-multiplication — no division, no
    * floats), so the identical definition is recomputable bit-exactly
    * in any engine from the pixel values: the property q76's oracle
    * exercises. grid ≤ 8 (≤ 64 bits packed in a Long); w,h ≥ grid so
    * no cell is empty. Images only — WAV → None. grid 8 (64-bit) is
    * the production default for real images; the tiny fixture rasters
    * force grid 4 in the registered query.
    */
  def aHashBits(bytes: Array[Byte], grid: Int): Option[Long] = {
    require(grid >= 2 && grid <= 8, s"aHash grid must be 2..8, got $grid")
    sniffFormat(bytes) match {
      case Some("bmp") => Some(aHashBmp(bytes, grid))
      case Some("ppm") => Some(aHashPpm(bytes, grid))
      case Some("png") => Some(aHashImageIo(bytes, grid, "png"))
      case Some("jpeg") => Some(aHashImageIo(bytes, grid, "jpeg"))
      case _ => None
    }
  }

  private def aHashCells(width: Int, height: Int, grid: Int,
      grayAt: (Int, Int) => Int): Long = {
    require(width >= grid && height >= grid,
      s"aHash grid $grid needs w,h ≥ $grid (got ${width}x$height)")
    val n = grid * grid
    val sums = new Array[Long](n)
    val cnts = new Array[Long](n)
    var total = 0L
    var y = 0
    while (y < height) {
      // cell indices in LONG: y·grid overflows Int past ~268M rows
      // (grid 8) and would index the cell arrays negative — the same
      // attacker-payload failure mode parseWavPcm's Long walk prevents
      val i = (y.toLong * grid / height).toInt
      var x = 0
      while (x < width) {
        val g = grayAt(x, y)
        val c = i * grid + (x.toLong * grid / width).toInt
        sums(c) += g; cnts(c) += 1; total += g
        x += 1
      }
      y += 1
    }
    val totalCnt = width.toLong * height
    var bits = 0L
    var c = 0
    while (c < n) {
      // exact at any image size: the cross products can exceed Long
      // for gigapixel rasters, so compare in BigInt (n ≤ 64 of these
      // per image — negligible against the raster walk)
      if (BigInt(sums(c)) * totalCnt > BigInt(total) * cnts(c)) bits |= 1L << c
      c += 1
    }
    bits
  }

  private def aHashBmp(bytes: Array[Byte], grid: Int): Long = {
    val h = parseBmpHeader(bytes)
    aHashCells(h.width, h.height, grid, (x, y) => {
      // positive stored height = bottom-up storage; gray is order-
      // invariant over the 3 channel bytes, so BGR vs RGB never matters
      val stored = if (h.topDown) y else h.height - 1 - y
      val off = h.dataOffset + stored * h.rowSize + 3 * x
      (bytes(off) & 0xFF) + (bytes(off + 1) & 0xFF) + (bytes(off + 2) & 0xFF)
    })
  }

  private def aHashPpm(bytes: Array[Byte], grid: Int): Long = {
    val h = parsePpmHeader(bytes)
    aHashCells(h.width, h.height, grid, (x, y) => {
      val p = h.rasterOff + 3 * (y * h.width + x)
      (bytes(p) & 0xFF) + (bytes(p + 1) & 0xFF) + (bytes(p + 2) & 0xFF)
    })
  }

  /** REAL nearest-neighbor resample of a 24-bit image payload (BMP or
    * PPM) to `tw`×`th`, re-encoded as binary PPM: target byte
    * k = (y·tw + x)·3 + c takes source byte
    * ((y·h div th)·w + (x·w div tw))·3 + c in the logical top-down
    * order both encoders share (our BMP encoder writes `pix(k)` bytes
    * verbatim, so channel order round-trips without a BGR swap). Pure
    * integer arithmetic end to end — an oracle can replay every
    * output byte. None for non-image payloads (the resize stage is a
    * pass-through for audio).
    */
  def resizeImage(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    require(tw > 0 && th > 0, s"resizeImage: target ${tw}x$th")
    def sampled(w: Int, h: Int, srcByte: (Int, Int, Int) => Int): Array[Byte] =
      encodePpm(tw, th, k => {
        val c = (k % 3).toInt
        val x = ((k / 3) % tw).toInt
        val y = (k / (3L * tw)).toInt
        srcByte((x.toLong * w / tw).toInt, (y.toLong * h / th).toInt, c)
      })
    sniffFormat(bytes) match {
      case Some("bmp") =>
        val h = parseBmpHeader(bytes)
        Some(sampled(h.width, h.height, (sx, sy, c) => {
          val stored = if (h.topDown) sy else h.height - 1 - sy
          bytes(h.dataOffset + stored * h.rowSize + 3 * sx + c) & 0xFF
        }))
      case Some("ppm") =>
        val h = parsePpmHeader(bytes)
        Some(sampled(h.width, h.height, (sx, sy, c) =>
          bytes(h.rasterOff + 3 * (sy * h.width + sx) + c) & 0xFF))
      case Some("png") | Some("jpeg") =>
        // JDK-codec arm: same integer source map over the decoded
        // raster (targets are small by definition — per-pixel getRGB
        // costs 3 ColorModel hops per TARGET pixel, not per source)
        val img = readImageIo(bytes, sniffFormat(bytes).get)
        Some(sampled(img.getWidth, img.getHeight, (sx, sy, c) => {
          val rgb = img.getRGB(sx, sy)
          c match {
            case 0 => (rgb >>> 16) & 0xFF
            case 1 => (rgb >>> 8) & 0xFF
            case _ => rgb & 0xFF
          }
        }))
      case _ => None
    }
  }

  // ---- PNG / JPEG via javax.imageio (JDK built-in, offline) ------------

  /** One-time ImageIO hardening: the default decode path spools
    * through a DISK-backed cache file per image — a per-row temp-file
    * create/delete inside every executor task. Memory-backed streams
    * keep the decode a pure in-heap walk.
    */
  private lazy val imageIoReady: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** PNG encode via the JDK's own codec: `pix(k)` supplies the pixel
    * byte at logical index k = (y·width + x)·3 + c (top-down, c =
    * R,G,B) — the SAME convention as [[encodeBmp]]/[[encodePpm]], so
    * one raster closed form drives all three containers. PNG is
    * lossless: decode returns these exact bytes, which is what lets a
    * driver oracle replay features of a real-world web-corpus format.
    */
  private def rasterImage(width: Int, height: Int,
      pix: Long => Int): java.awt.image.BufferedImage = {
    require(width > 0 && height > 0)
    imageIoReady
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val k = (y.toLong * width + x) * 3
        img.setRGB(x, y,
          ((pix(k) & 0xFF) << 16) | ((pix(k + 1) & 0xFF) << 8) | (pix(k + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    img
  }

  def encodePng(width: Int, height: Int, pix: Long => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rasterImage(width, height, pix), "png", out)
    out.toByteArray
  }

  /** JPEG encode (JDK codec, default quality). LOSSY: decoded pixel
    * values are codec-dependent, so JPEG features are spec-verified
    * for determinism and container facts, never driver-oracle'd on
    * pixel means (PNG is the hash-exact real-world container).
    */
  def encodeJpeg(width: Int, height: Int, pix: Long => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rasterImage(width, height, pix), "jpg", out)
    out.toByteArray
  }

  /** ImageIO decode normalized to the quarantine contract: EVERY
    * corrupt-payload failure mode (IIOException, null return for
    * unrecognizable content, zero dims) becomes IllegalArgumentException
    * — the exception class [[Multimodal.resizeMedia]]'s per-row
    * quarantine catches. Without the wrap, ImageIO's IOException would
    * kill a whole stage on one truncated crawl image.
    */
  private def readImageIo(bytes: Array[Byte], fmt: String): java.awt.image.BufferedImage = {
    imageIoReady
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: java.io.IOException =>
          throw new IllegalArgumentException(s"corrupt $fmt: ${e.getMessage}")
        // ImageIO's PNG plugin surfaces crafted-header corruption as
        // NegativeArraySize / IndexOutOfBounds / IllegalArgument —
        // still a corrupt payload, still quarantine, never a stage
        // kill. The catch is NARROW on purpose: an NPE or a plugin
        // defect is a genuine bug and must surface, not be silently
        // filed as one more corrupt row.
        case e @ (_: NegativeArraySizeException |
                  _: IndexOutOfBoundsException |
                  _: IllegalArgumentException) =>
          throw new IllegalArgumentException(s"corrupt $fmt: ${e.getClass.getSimpleName}")
      }
    if (img == null)
      throw new IllegalArgumentException(s"corrupt $fmt container (undecodable)")
    require(img.getWidth > 0 && img.getHeight > 0,
      s"corrupt $fmt dims (${img.getWidth}x${img.getHeight})")
    img
  }

  /** Row-bulk gray/RGB walk shared by decode, aHash, and resize: one
    * `getRGB` batch per row (the per-pixel accessor crosses the
    * ColorModel on every call — ~10× slower on large rasters).
    */
  private def decodeImageIo(bytes: Array[Byte], fmt: String): Decoded = {
    val img = readImageIo(bytes, fmt)
    val w = img.getWidth
    val h = img.getHeight
    val row = new Array[Int](w)
    var sum = 0L
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        sum += ((rgb >>> 16) & 0xFF) + ((rgb >>> 8) & 0xFF) + (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    val n = 3L * w * h
    // channels = the decoded COLOR-SPACE component count, alpha
    // excluded (getNumColorComponents, not getNumComponents — RGBA
    // reports 3, not 4): gray PNG 1, RGB and palette PNG 3 (palette
    // entries are RGB triples; the index is an encoding detail, not a
    // color space), CMYK JPEG 4. Spec-pinned for gray/RGBA/palette.
    // The mean stays the sRGB-converted 3-channel mean regardless
    // (getRGB is the deterministic, container-independent view).
    Decoded(fmt, w, h, img.getColorModel.getNumColorComponents, 0, 0L,
      if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Decode PNG container facts + mean pixel byte (JDK codec). */
  def decodePng(bytes: Array[Byte]): Decoded = decodeImageIo(bytes, "png")

  /** Decode JPEG container facts + mean pixel byte (JDK codec). */
  def decodeJpeg(bytes: Array[Byte]): Decoded = decodeImageIo(bytes, "jpeg")

  private def aHashImageIo(bytes: Array[Byte], grid: Int, fmt: String): Long = {
    val img = readImageIo(bytes, fmt)
    val w = img.getWidth
    val rowBuf = new Array[Int](w)
    var lastY = -1
    // aHashCells walks y-major, x-inner — one bulk row fetch per y
    aHashCells(w, img.getHeight, grid, (x, y) => {
      if (y != lastY) { img.getRGB(0, y, w, 1, rowBuf, 0, w); lastY = y }
      val rgb = rowBuf(x)
      ((rgb >>> 16) & 0xFF) + ((rgb >>> 8) & 0xFF) + (rgb & 0xFF)
    })
  }

  // ---- WAV (RIFF, PCM 16-bit) ------------------------------------------

  /** RIFF/WAVE with one `fmt ` chunk (PCM, 16-bit) and one `data`
    * chunk. `sample(k)` supplies the k-th interleaved signed sample,
    * k = 0 .. channels·frames − 1.
    */
  def encodeWav(channels: Int, sampleRate: Int, frames: Long,
      sample: Long => Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && frames >= 0)
    val n = channels * frames
    val dataSize = (2 * n).toInt
    val out = new ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 36 + dataSize)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    le32(out, 16)
    le16(out, 1) // PCM
    le16(out, channels)
    le32(out, sampleRate)
    le32(out, sampleRate * channels * 2) // byte rate
    le16(out, channels * 2)              // block align
    le16(out, 16)                        // bits per sample
    out.write("data".getBytes("US-ASCII"))
    le32(out, dataSize)
    var k = 0L
    while (k < n) { le16(out, sample(k) & 0xFFFF); k += 1 }
    out.toByteArray
  }

  /** Parsed WAV facts shared by the feature decode and the audio
    * fingerprint: channel count, rate, and the validated PCM span
    * (`dataStart`, `nSamples` interleaved 16-bit samples).
    */
  private case class WavPcm(channels: Int, sampleRate: Int,
      dataStart: Int, nSamples: Int)

  /** Walk the RIFF chunk list (odd-sized chunks are pad-aligned, per
    * spec) for `fmt ` and `data`; validate PCM 16-bit bounds.
    */
  private def parseWavPcm(bytes: Array[Byte]): WavPcm = {
    require(bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a RIFF/WAVE")
    // The chunk walk runs in LONG (mirroring decodeBmp/decodePpm's
    // size checks): a crafted size near Int.MaxValue must not wrap
    // `off` negative (which would pass the loop bound and index out
    // of bounds on the next header read) — in Long the walk simply
    // steps past the buffer and the missing-chunk requires fire.
    var off = 12L
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var dataOff = -1L
    var dataLen = 0
    while (off + 8 <= bytes.length) {
      val o = off.toInt // off + 8 <= length ⇒ off fits in Int
      val id = new String(bytes, o, 4, "US-ASCII")
      val size = readLe32(bytes, o + 4)
      // the size field is attacker-controlled: a negative value would
      // stall or reverse the walk (infinite loop in a Spark task, not
      // a rejection) and a huge one would index out of bounds
      require(size >= 0, s"corrupt WAV chunk size $size")
      id match {
        case "fmt " =>
          require(off + 24 <= bytes.length && size >= 16, "truncated fmt chunk")
          require(readLe16(bytes, o + 8) == 1, "non-PCM WAV unsupported")
          channels = readLe16(bytes, o + 10)
          sampleRate = readLe32(bytes, o + 12)
          bits = readLe16(bytes, o + 22)
        case "data" =>
          dataOff = off + 8; dataLen = size
        case _ => // skip unknown chunks (LIST, INFO, ...)
      }
      off += 8L + size + (size & 1)
    }
    require(channels > 0 && sampleRate > 0, "missing fmt chunk")
    require(bits == 16, s"unsupported WAV bit depth $bits")
    // Long-side bound: dataOff + dataLen can exceed Int.MaxValue for a
    // crafted size — an Int comparison would wrap, pass, and AIOOBE in
    // the PCM loop instead of rejecting.
    require(dataOff >= 0 && bytes.length.toLong >= dataOff + dataLen.toLong,
      "missing/truncated data chunk")
    // bounded by bytes.length via the require
    WavPcm(channels, sampleRate, dataOff.toInt, dataLen / 2)
  }

  /** Decode 16-bit signed PCM container facts + mean sample. */
  def decodeWav(bytes: Array[Byte]): Decoded = {
    val w = parseWavPcm(bytes)
    var sum = 0L
    var i = 0
    while (i < w.nSamples) {
      sum += readLe16(bytes, w.dataStart + 2 * i).toShort.toLong
      i += 1
    }
    Decoded("wav", 0, 0, w.channels, w.sampleRate,
      w.nSamples.toLong / w.channels,
      if (w.nSamples == 0) 0.0 else sum.toDouble / w.nSamples)
  }

  /** `nCells`-bit audio fingerprint over the interleaved PCM stream:
    * bit c is set iff cell c's mean |sample| STRICTLY exceeds the
    * stream mean — the 1-D analogue of [[aHashBits]], and like it
    * EXACT-INTEGER (BigInt cross-multiplication, no division), so the
    * identical bit definition is recomputable in any engine from the
    * sample values. Cell boundaries partition the interleaved index
    * at k·nCells/n. Audio only — images → None. nCells ≤ 64 packs in
    * a Long; the stream must carry ≥ nCells samples so no cell is
    * empty. 64 cells is the production default; the fixture streams
    * (n ≥ 40) force 32 in the registered query.
    */
  def audioFingerprintBits(bytes: Array[Byte], nCells: Int): Option[Long] = {
    require(nCells >= 2 && nCells <= 64, s"fingerprint cells must be 2..64, got $nCells")
    if (sniffFormat(bytes).contains("wav")) {
      val w = parseWavPcm(bytes)
      val n = w.nSamples
      require(n >= nCells, s"fingerprint needs >= $nCells samples (got $n)")
      val sums = new Array[Long](nCells)
      val cnts = new Array[Long](nCells)
      var total = 0L
      var k = 0
      while (k < n) {
        val v = math.abs(readLe16(bytes, w.dataStart + 2 * k).toShort.toLong)
        val c = (k.toLong * nCells / n).toInt
        sums(c) += v; cnts(c) += 1; total += v
        k += 1
      }
      var bits = 0L
      var c = 0
      while (c < nCells) {
        // |sample| ≤ 32768, so sums ≤ 32768·n: the cross products can
        // exceed Long for multi-hour streams — compare in BigInt
        // (nCells ≤ 64 of these per payload — negligible)
        if (BigInt(sums(c)) * n > BigInt(total) * cnts(c)) bits |= 1L << c
        c += 1
      }
      Some(bits)
    } else None
  }

  // ---- dispatch --------------------------------------------------------

  /** Container sniff from magic bytes — THE format authority for every
    * operator in this file and for the DataFrame stages in
    * [[Multimodal]] (caller metadata is never trusted, and the
    * quarantine contract requires all paths to agree on what counts
    * as each container). None = unrecognized.
    */
  def sniffFormat(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') Some("bmp")
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') Some("ppm")
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F') Some("wav")
    else if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G' &&
      bytes(4) == 0x0D && bytes(5) == 0x0A && bytes(6) == 0x1A &&
      bytes(7) == 0x0A) Some("png")
    else if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8 && (bytes(2) & 0xFF) == 0xFF) Some("jpeg")
    else None

  /** Container detection from magic bytes — caller metadata is never
    * trusted. Throws on anything unrecognized (a real pipeline routes
    * those rows to a quarantine sink, not past the decoder).
    */
  def decode(bytes: Array[Byte]): Decoded = sniffFormat(bytes) match {
    case Some("bmp") => decodeBmp(bytes)
    case Some("ppm") => decodePpm(bytes)
    case Some("wav") => decodeWav(bytes)
    case Some("png") => decodePng(bytes)
    case Some("jpeg") => decodeJpeg(bytes)
    case _ => throw new IllegalArgumentException(
      s"unrecognized media container (${bytes.length} bytes)")
  }
}
