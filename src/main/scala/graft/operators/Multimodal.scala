package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline: image /
  * audio / video payloads are opaque BINARY columns plus typed
  * metadata, processed with per-partition batch iteration.
  *
  * The Spark-side design is real and tested — schema, encoders, the
  * mapPartitions batch shape (one codec init per partition, rows
  * streamed through it), partition-count-invariant results. The codec
  * dispatches on the payload's magic bytes, the way any real sniffing
  * decoder does:
  *
  *  - 'BM' → a REAL pure-JVM 24-bit BMP parse ([[decodeBmp]]): file +
  *    info headers validated, row stride padded to 4 bytes, bottom-up
  *    AND top-down row orders handled, pixels reassembled top-down.
  *    No native libraries — the format is simple enough to decode
  *    from first principles, which makes the gate exercise genuine
  *    byte decoding (a stride or row-order bug is a hash mismatch).
  *  - PNG signature → a REAL pure-JVM PNG parse ([[decodePng]]):
  *    chunk walk with CRC validation, multi-IDAT zlib inflate (JDK
  *    Inflater), and full scanline filter reconstruction
  *    (None/Sub/Up/Average/Paeth) for 8-bit non-interlaced RGB.
  *  - JPEG SOI → a REAL pure-JVM baseline sequential decoder
  *    ([[decodeJpeg]]): marker walk, DQT/DHT collection, Huffman
  *    entropy decode with byte unstuffing, dequantize/dezigzag,
  *    separable IDCT — grayscale subset.
  *  - JPEG SOI with progressive SOF2 → the progressive extension of
  *    the baseline decoder (spectral selection + successive
  *    approximation refinement passes).
  *  - 'RIFF…WAVE' → a REAL pure-JVM WAV/PCM parse ([[decodeWav]]):
  *    chunk walk, 8/16-bit mono/stereo PCM, Goertzel band features.
  *  - 'RIFF…AVI ' → a REAL pure-JVM MJPEG-AVI parse ([[decodeAvi]]):
  *    chunk/list walk, per-frame JPEG decode through [[decodeJpeg]],
  *    frame sampling.
  *  - anything else → the deterministic [[stubDecode]], standing in
  *    for the codecs beyond these six that DO need native libraries
  *    in an environment that has none. Swapping one in changes one
  *    branch of the dispatch and nothing about the distributed plan.
  */
object Multimodal {

  /** Decoded media record: dimensions, a fixed-size feature vector, and
    * the payload content hash (provenance/dedup key in a real pipeline). */
  final case class Decoded(
      media_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      content_hash: Long,
      features: Array[Float])

  val FeatureDim = 16

  /** Wrap an id+text corpus as deterministic fake media rows
    * (media_id, payload BINARY, mime STRING) — the at-rest shape a
    * crawler would land: opaque bytes + a type tag.
    */
  def asMedia(df: DataFrame, id: String, text: String): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      encode(col(text), "utf-8").as("payload"),
      concat(lit("image/fake-"), (col(id) % 3).cast("string")).as("mime"))

  /** STUB CODEC — deterministic pure function of the payload bytes.
    * A real integration decodes the image/audio here; everything else
    * in this file is the production plumbing. The rolling hash is
    * modular (never overflows a signed 64-bit value), so the decode is
    * reproducible in plain SQL and x_multimodal_decode can be
    * oracle-checked.
    */
  private[operators] def stubDecode(payload: Array[Byte]): (Int, Int, Int, Long, Array[Float]) = {
    var h = 0L // rolling hash: h = (h*31 + byte) mod 1e9+7
    var i = 0
    while (i < payload.length) { h = (h * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
    val width = ((h % 64) + 1).toInt * 16
    val height = (((h >> 8) % 64) + 1).toInt * 16
    val nFrames = (((h >> 16) % 10) + 1).toInt
    val features = Array.tabulate(FeatureDim) { k =>
      ((h >> (k * 3)) & 0xff).toFloat / 255f
    }
    (width, height, nFrames, h, features)
  }

  // --- real pure-JVM BMP codec -------------------------------------------

  /** Bytes-per-row stride of a 24-bit BMP: 3·width padded to 4 bytes. */
  private def bmpStride(width: Int): Int = ((width * 3) + 3) & ~3

  /** Encode a logical top-down byte array as a 24-bit uncompressed BMP
    * (`width` pixels per row = 3·width payload bytes per row, zero-padded
    * to fill the last row; rows stored bottom-up per the format default).
    * Used by [[asBmpMedia]] to give the decode path REAL image bytes.
    */
  def encodeBmp24(pixels: Array[Byte], width: Int): Array[Byte] = {
    require(width >= 1, s"bmp width must be >= 1, got $width")
    val rowBytes = width * 3
    val height = math.max(1, (pixels.length + rowBytes - 1) / rowBytes)
    val stride = bmpStride(width)
    val fileSize = 54 + stride * height
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)                      // file header
    out.putInt(40).putInt(width).putInt(height).putShort(1)
      .putShort(24).putInt(0).putInt(stride * height)
      .putInt(0).putInt(0).putInt(0).putInt(0)                 // info header
    var r = height - 1 // bottom-up
    while (r >= 0) {
      var i = 0
      while (i < rowBytes) {
        val src = r * rowBytes + i
        out.put(if (src < pixels.length) pixels(src) else 0.toByte)
        i += 1
      }
      var p = rowBytes
      while (p < stride) { out.put(0.toByte); p += 1 } // stride padding
      r -= 1
    }
    out.array()
  }

  /** Parse a 24-bit uncompressed BMP: returns (width, height, logical
    * top-down pixel bytes — stride padding stripped, bottom-up storage
    * unreversed). None when the payload is not such a BMP.
    */
  def decodeBmp(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < 54 || payload(0) != 'B'.toByte || payload(1) != 'M'.toByte)
      return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)  // negative = rows stored top-down
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    if (width <= 0 || rawHeight == 0 || bpp != 24 || compression != 0) return None
    val height = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val rowBytes = width * 3
    val stride = bmpStride(width)
    if (dataOffset < 54 || dataOffset.toLong + stride.toLong * height > payload.length)
      return None
    val pixels = new Array[Byte](rowBytes * height)
    var r = 0
    while (r < height) {
      val fileRow = if (bottomUp) height - 1 - r else r
      System.arraycopy(payload, dataOffset + fileRow * stride, pixels, r * rowBytes, rowBytes)
      r += 1
    }
    Some((width, height, pixels))
  }

  /** Wrap an id+text corpus as REAL media rows: each payload is a valid
    * 24-bit BMP whose pixel bytes are the document's UTF-8 text (an
    * odd pixel width, so every row carries genuine stride padding the
    * decoder must strip). The at-rest shape is identical to [[asMedia]];
    * the bytes actually decode.
    */
  def asBmpMedia(df: DataFrame, id: String, text: String,
      width: Int = BmpMediaWidth): DataFrame = {
    val enc = udf((t: String) => encodeBmp24(t.getBytes("UTF-8"), width))
    df.select(
      col(id).cast("long").as("media_id"),
      enc(col(text)).as("payload"),
      lit("image/bmp").as("mime"))
  }

  /** 25 px = 75 payload bytes/row, stride 76 — real padding every row. */
  val BmpMediaWidth = 25

  // --- real pure-JVM PNG codec (8-bit RGB, non-interlaced) ---------------

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc32(typ: Array[Byte], data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32
    c.update(typ); c.update(data)
    c.getValue.toInt
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val b = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    val t = typ.getBytes("US-ASCII")
    out.write(b); out.write(t); out.write(data)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc32(t, data)).array())
  }

  /** Encode a logical top-down byte array as an 8-bit RGB
    * non-interlaced PNG (`width` pixels per row = 3·width payload
    * bytes, zero-padded to fill the last row — the same logical-pixel
    * contract as [[encodeBmp24]], so the two formats decode to
    * identical pixel bytes). Scanlines are filter-type-0; the IDAT
    * stream is JDK Deflater zlib.
    */
  def encodePng(pixels: Array[Byte], width: Int): Array[Byte] = {
    require(width >= 1, s"png width must be >= 1, got $width")
    val rowBytes = width * 3
    val height = math.max(1, (pixels.length + rowBytes - 1) / rowBytes)
    val raw = new Array[Byte](height * (1 + rowBytes))
    var r = 0
    while (r < height) {
      // raw(r * (rowBytes + 1)) stays 0: filter type None
      var i = 0
      while (i < rowBytes) {
        val src = r * rowBytes + i
        if (src < pixels.length) raw(r * (rowBytes + 1) + 1 + i) = pixels(src)
        i += 1
      }
      r += 1
    }
    val deflater = new java.util.zip.Deflater
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    val out = new java.io.ByteArrayOutputStream
    out.write(PngSig)
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", comp.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse an 8-bit RGB non-interlaced PNG: signature, chunk walk with
    * CRC validation, multi-IDAT concatenation, zlib inflate, and FULL
    * scanline filter reconstruction (None/Sub/Up/Average/Paeth — a
    * spec-compliant decoder must handle all five regardless of what
    * the encoder emitted). Returns (width, height, top-down pixel
    * bytes); None when the payload is not such a PNG.
    */
  def decodePng(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < PngSig.length + 12 ||
      !payload.take(PngSig.length).sameElements(PngSig)) return None
    val buf = java.nio.ByteBuffer.wrap(payload)
    buf.position(PngSig.length)
    var width = 0
    var height = 0
    var headerOk = false
    val idat = new java.io.ByteArrayOutputStream
    var done = false
    while (!done) {
      if (buf.remaining() < 8) return None
      val len = buf.getInt
      if (len < 0 || buf.remaining() < len + 8) return None
      val typ = new Array[Byte](4); buf.get(typ)
      val data = new Array[Byte](len); buf.get(data)
      val crc = buf.getInt
      if (crc != crc32(typ, data)) return None
      new String(typ, "US-ASCII") match {
        case "IHDR" =>
          if (len != 13) return None
          val h = java.nio.ByteBuffer.wrap(data)
          width = h.getInt; height = h.getInt
          val depth = h.get(); val color = h.get()
          val interlace = data(12)
          // this decoder: 8-bit truecolor RGB, no interlace
          if (width <= 0 || height <= 0 || depth != 8 || color != 2 ||
            interlace != 0) return None
          headerOk = true
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
    }
    if (!headerOk || idat.size() == 0) return None
    val rowBytes = width * 3
    val expected = height * (1 + rowBytes)
    val raw = new Array[Byte](expected)
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < expected && !inflater.finished()) {
        val n = inflater.inflate(raw, off, expected - off)
        if (n == 0 && inflater.needsInput()) return None // truncated
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (off != expected) return None
    // filter reconstruction, 3 bytes per pixel
    val px = new Array[Byte](height * rowBytes)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var r = 0
    while (r < height) {
      val ft = raw(r * (1 + rowBytes)) & 0xff
      val src = r * (1 + rowBytes) + 1
      val dst = r * rowBytes
      var i = 0
      while (i < rowBytes) {
        val x = raw(src + i) & 0xff
        val left = if (i >= 3) px(dst + i - 3) & 0xff else 0
        val up = if (r > 0) px(dst - rowBytes + i) & 0xff else 0
        val ul = if (r > 0 && i >= 3) px(dst - rowBytes + i - 3) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 => x + paeth(left, up, ul)
          case _ => return None
        }
        px(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Some((width, height, px))
  }

  // --- real pure-JVM baseline JPEG codec (sequential, 8-bit, grayscale) --

  /** Zigzag order: zigzag(i) = natural (row-major) index of the i-th
    * coefficient in the entropy-coded stream (ITU T.81 Figure A.6). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** ITU T.81 Annex K.3.3.1 typical luminance DC table: code counts per
    * length 1..16, then the symbol list (categories 0..11). */
  private val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray

  /** ITU T.81 Annex K.3.3.2 typical luminance AC table. */
  private val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman code assignment (T.81 Annex C): returns
    * symbol → (code, length). */
  private def huffCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (nbits > 0) put(0xff, 8 - nbits)
  }

  /** Bit category of a DC/AC value (T.81 F.1.2.1.2): smallest s with
    * |v| < 2^s; the appended raw bits are v (v ≥ 0) or v - 1 + 2^s. */
  private def bitCategory(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode one input byte per constant 8×8 block as a baseline
    * sequential grayscale JPEG (SOI/DQT/SOF0/DHT/SOS/EOI, Annex K
    * Huffman tables, flat quantization): image is `blocksPerRow` blocks
    * across, ceil(len/blocksPerRow) block-rows down (min 1), missing
    * trailing blocks zero-filled. Constant blocks carry ONLY a DC
    * coefficient, and flat quantization keeps that DC exact — so this
    * lossy format round-trips these payloads bit-exactly, which is what
    * lets the decode gate hash-check a REAL entropy-decode + IDCT
    * pipeline. */
  def encodeJpegBlocks(bytes: Array[Byte], blocksPerRow: Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(blocksPerRow >= 1 && blocksPerRow <= 1024,
      s"blocksPerRow must be in [1, 1024], got $blocksPerRow")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"restartInterval must be in [0, 65535], got $restartInterval")
    val blockRows = math.max(1, (bytes.length + blocksPerRow - 1) / blocksPerRow)
    val width = blocksPerRow * 8
    val height = blockRows * 8
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body)
    }
    marker(0xd8) // SOI
    segment(0xdb, Array.tabulate(65)(i => if (i == 0) 0 else 1).map(_.toByte)) // DQT: Pq=0 Tq=0, flat 1s
    segment(0xc0, Array[Int]( // SOF0: 8-bit, 1 component, 1x1 sampling
      8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      1, 1, 0x11, 0).map(_.toByte))
    segment(0xc4, (Array(0x00) ++ DcBits ++ DcVals).map(_.toByte)) // DHT DC 0
    segment(0xc4, (Array(0x10) ++ AcBits ++ AcVals).map(_.toByte)) // DHT AC 0
    if (restartInterval > 0) // DRI: RSTn every restartInterval MCUs
      segment(0xdd, Array[Int](restartInterval >> 8, restartInterval & 0xff).map(_.toByte))
    segment(0xda, Array[Int](1, 1, 0x00, 0, 63, 0).map(_.toByte))  // SOS
    val dc = huffCodes(DcBits, DcVals)
    val ac = huffCodes(AcBits, AcVals)
    var bw = new BitWriter(out)
    val (eobCode, eobLen) = ac(0x00)
    var prevDc = 0
    var b = 0
    var rst = 0
    val nBlocks = blockRows * blocksPerRow
    while (b < nBlocks) {
      if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
        // restart boundary: byte-align (1-pad), emit RSTn, reset the
        // DC predictor — a fresh entropy segment per T.81 F.1.2.3
        bw.flush()
        marker(0xd0 + rst)
        rst = (rst + 1) % 8
        bw = new BitWriter(out)
        prevDc = 0
      }
      val v = if (b < bytes.length) bytes(b) & 0xff else 0
      val dcCoef = 8 * (v - 128) // flat quant: stored value IS the coefficient
      val diff = dcCoef - prevDc
      prevDc = dcCoef
      val s = bitCategory(diff)
      val (c, l) = dc(s)
      bw.put(c, l)
      if (s > 0) bw.put(if (diff >= 0) diff else diff - 1 + (1 << s), s)
      bw.put(eobCode, eobLen) // all AC zero
      b += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** The same constant-block grayscale content as [[encodeJpegBlocks]]
    * in a PROGRESSIVE (SOF2) container: three scans — DC first with
    * successive-approximation point transform Al=1, a DC refinement
    * scan carrying the dropped bit, then the AC band as per-block EOB
    * symbols. Decodes to the identical pixels as the baseline form (a
    * constant block's DC is exact under flat quantization and the
    * approximation recomposes exactly), so the mixed-media gate can
    * route part of its JPEG arm through the progressive path WITHOUT
    * touching the oracle. */
  def encodeJpegBlocksProgressive(bytes: Array[Byte], blocksPerRow: Int): Array[Byte] = {
    require(blocksPerRow >= 1 && blocksPerRow <= 1024,
      s"blocksPerRow must be in [1, 1024], got $blocksPerRow")
    val blockRows = math.max(1, (bytes.length + blocksPerRow - 1) / blocksPerRow)
    val width = blocksPerRow * 8
    val height = blockRows * 8
    val nBlocks = blockRows * blocksPerRow
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body)
    }
    def dcCoef(b: Int): Int =
      8 * ((if (b < bytes.length) bytes(b) & 0xff else 0) - 128)
    marker(0xd8)
    segment(0xdb, Array.tabulate(65)(i => if (i == 0) 0 else 1).map(_.toByte))
    segment(0xc2, Array[Int]( // SOF2: progressive, 1 component, 1x1
      8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      1, 1, 0x11, 0).map(_.toByte))
    segment(0xc4, (Array(0x00) ++ DcBits ++ DcVals).map(_.toByte))
    segment(0xc4, (Array(0x10) ++ AcBits ++ AcVals).map(_.toByte))
    val dc = huffCodes(DcBits, DcVals)
    val ac = huffCodes(AcBits, AcVals)
    // scan 1: DC first, Ss=Se=0, Ah=0, Al=1 — codes diffs of dc >> 1
    segment(0xda, Array[Int](1, 1, 0x00, 0, 0, 0x01).map(_.toByte))
    var bw = new BitWriter(out)
    var prev = 0
    var b = 0
    while (b < nBlocks) {
      val approx = dcCoef(b) >> 1
      val diff = approx - prev
      prev = approx
      val s = bitCategory(diff)
      val (c, l) = dc(s)
      bw.put(c, l)
      if (s > 0) bw.put(if (diff >= 0) diff else diff - 1 + (1 << s), s)
      b += 1
    }
    bw.flush()
    // scan 2: DC refinement, Ah=1, Al=0 — the dropped low bit per block
    segment(0xda, Array[Int](1, 1, 0x00, 0, 0, 0x10).map(_.toByte))
    bw = new BitWriter(out)
    b = 0
    while (b < nBlocks) { bw.put(dcCoef(b) & 1, 1); b += 1 }
    bw.flush()
    // scan 3: the whole AC band, first pass — every block is one EOB
    segment(0xda, Array[Int](1, 1, 0x00, 1, 63, 0x00).map(_.toByte))
    bw = new BitWriter(out)
    val (eobCode, eobLen) = ac(0x00)
    b = 0
    while (b < nBlocks) { bw.put(eobCode, eobLen); b += 1 }
    bw.flush()
    marker(0xd9)
    out.toByteArray
  }

  /** Encode one input byte per constant COLOR 8×8 block as a baseline
    * 3-component 4:4:4 YCbCr JPEG: byte b maps to the deterministic
    * triple Y=b, Cb=(7b+13) mod 256, Cr=(31b+29) mod 256 — so the
    * decoded RGB is a pure arithmetic function of the byte (DC-only
    * constant blocks are exact under flat quantization; the JFIF
    * conversion is one fixed IEEE sequence) and a hash gate can
    * replay the COLOR pipeline: interleaved MCUs, three DC
    * predictors, and YCbCr→RGB. */
  def encodeJpegColorBlocks(bytes: Array[Byte], blocksPerRow: Int): Array[Byte] = {
    require(blocksPerRow >= 1 && blocksPerRow <= 1024,
      s"blocksPerRow must be in [1, 1024], got $blocksPerRow")
    val blockRows = math.max(1, (bytes.length + blocksPerRow - 1) / blocksPerRow)
    val width = blocksPerRow * 8
    val height = blockRows * 8
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body)
    }
    marker(0xd8)
    segment(0xdb, Array.tabulate(65)(i => if (i == 0) 0 else 1).map(_.toByte))
    segment(0xc0, Array[Int]( // SOF0: 3 components, all 1×1 (4:4:4)
      8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0).map(_.toByte))
    segment(0xc4, (Array(0x00) ++ DcBits ++ DcVals).map(_.toByte))
    segment(0xc4, (Array(0x10) ++ AcBits ++ AcVals).map(_.toByte))
    segment(0xda, Array[Int](3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0).map(_.toByte))
    val dc = huffCodes(DcBits, DcVals)
    val ac = huffCodes(AcBits, AcVals)
    val bw = new BitWriter(out)
    val (eobCode, eobLen) = ac(0x00)
    val prevDc = new Array[Int](3)
    var blk = 0
    val nBlocks = blockRows * blocksPerRow
    while (blk < nBlocks) {
      val b = if (blk < bytes.length) bytes(blk) & 0xff else 0
      val ycc = Array(b, (7 * b + 13) % 256, (31 * b + 29) % 256)
      var ci = 0
      while (ci < 3) { // one MCU = one block per component, interleaved
        val dcCoef = 8 * (ycc(ci) - 128)
        val diff = dcCoef - prevDc(ci)
        prevDc(ci) = dcCoef
        val s = bitCategory(diff)
        val (c, l) = dc(s)
        bw.put(c, l)
        if (s > 0) bw.put(if (diff >= 0) diff else diff - 1 + (1 << s), s)
        bw.put(eobCode, eobLen)
        ci += 1
      }
      blk += 1
    }
    bw.flush()
    marker(0xd9)
    out.toByteArray
  }

  private final class BitReader(data: Array[Byte], private var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var bad = false
    /** Current byte offset — after a scan's entropy data is consumed,
      * the resume point for the outer marker walk (the reader parks on
      * a marker, never past it). */
    def position: Int = pos
    /** Next bit, honoring 0xFF00 stuffing; sets `bad` past data end. */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) { bad = true; return 0 }
        val b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length || (data(pos) & 0xff) != 0x00) {
            // a marker (e.g. EOI): entropy data is exhausted — bits
            // requested past it read as 1s (T.81 pads with 1-bits),
            // and `pos` stays parked on the marker
            acc = 0xff; nbits = 8
            pos -= 1
            return bit()
          }
          pos += 1 // skip stuffed 0x00
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** At a restart boundary: drop partial-byte bits, consume the next
      * marker (skipping 0xFF fill bytes), and return its code —
      * -1 when the stream holds no marker there. */
    def syncMarker(): Int = {
      acc = 0; nbits = 0
      while (pos < data.length && (data(pos) & 0xff) == 0xff &&
        pos + 1 < data.length && (data(pos + 1) & 0xff) == 0xff)
        pos += 1 // 0xFF fill bytes before a marker are legal padding
      if (pos + 1 >= data.length || (data(pos) & 0xff) != 0xff) return -1
      val m = data(pos + 1) & 0xff
      pos += 2
      m
    }
  }

  /** Huffman decode table: (length-indexed min-code ranges) per T.81
    * F.2.2.3, built from a DHT segment's BITS/HUFFVAL. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
      }
    }
    /** Decode the next symbol; -1 on an invalid code. */
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        code = (code << 1) | br.bit()
        if (br.bad) return -1
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return vals(valPtr(l) + code - minCode(l))
        l += 1
      }
      -1
    }
  }

  /** Extend a `s`-bit magnitude to its signed value (T.81 F.2.2.1). */
  private def huffExtend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private val IdctCos: Array[Double] =
    Array.tabulate(8, 8) { (x, u) =>
      (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
        StrictMath.cos((2 * x + 1) * u * math.Pi / 16.0)
    }.flatten

  /** One frame component: id, sampling factors, table assignments. */
  private final class JComp(val id: Int, val h: Int, val v: Int, val qId: Int) {
    var dcId: Int = -1
    var acId: Int = -1
    var plane: Array[Byte] = null
    var planeW: Int = 0
  }

  /** Decode one coefficient block into `plane` at block position
    * (bx, by): Huffman DC/AC decode, dequantize+dezigzag, separable
    * floating IDCT with a DC-only fast path (exact for flat-quant
    * constant blocks — the lossless round-trip the gate pins).
    * Returns the new DC predictor, or Int.MinValue on corrupt data. */
  private def decodeBlock(br: BitReader, dcT: HuffTable, acT: HuffTable,
      q: Array[Int], prevDc: Int, plane: Array[Byte], planeW: Int,
      bx: Int, by: Int, coef: Array[Int], tmp: Array[Double]): Int = {
    java.util.Arrays.fill(coef, 0)
    val s = dcT.decode(br)
    if (s < 0 || s > 15) return Int.MinValue
    val dc = prevDc + huffExtend(br.bits(s), s)
    coef(0) = dc * q(0)
    var k = 1
    var acOnly0 = true
    while (k < 64) {
      val rs = acT.decode(br)
      if (rs < 0) return Int.MinValue
      val run = (rs >> 4) & 0xf
      val size = rs & 0xf
      if (size == 0) {
        if (run == 15) k += 16 // ZRL
        else k = 64 // EOB
      } else {
        k += run
        if (k > 63) return Int.MinValue
        coef(Zigzag(k)) = huffExtend(br.bits(size), size) * q(k)
        acOnly0 = false
        k += 1
      }
    }
    if (br.bad) return Int.MinValue
    idctToPlane(coef, acOnly0, plane, planeW, bx, by, tmp)
    dc
  }

  /** Inverse DCT of one dequantized NATURAL-order coefficient block
    * into `plane` at block (bx, by) — shared by the baseline and
    * progressive finishers. `dcOnly` takes the exact flat fast path
    * (the lossless round-trip the constant-block gates pin). */
  private def idctToPlane(coef: Array[Int], dcOnly: Boolean,
      plane: Array[Byte], planeW: Int, bx: Int, by: Int,
      tmp: Array[Double]): Unit = {
    val base = (by * 8) * planeW + bx * 8
    if (dcOnly) {
      val v = math.max(0, math.min(255, math.round(coef(0) / 8.0).toInt + 128)).toByte
      var y = 0
      while (y < 8) {
        java.util.Arrays.fill(plane, base + y * planeW, base + y * planeW + 8, v)
        y += 1
      }
    } else {
      // separable: rows (u over columns), then columns
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var sum = 0.0
          var u = 0
          while (u < 8) { sum += IdctCos(x * 8 + u) * coef(y * 8 + u); u += 1 }
          tmp(y * 8 + x) = sum
          x += 1
        }
        y += 1
      }
      var x = 0
      while (x < 8) {
        var y = 0
        while (y < 8) {
          var sum = 0.0
          var v = 0
          while (v < 8) { sum += IdctCos(y * 8 + v) * tmp(v * 8 + x); v += 1 }
          plane(base + y * planeW + x) =
            math.max(0, math.min(255, math.round(sum / 4.0).toInt + 128)).toByte
          y += 1
        }
        x += 1
      }
    }
  }

  /** Parse a baseline sequential 8-bit JPEG (SOF0; grayscale or
    * 3-component YCbCr with sampling factors up to 2×2 — 4:4:4, 4:2:2,
    * 4:2:0; optional restart intervals), decoded the way any baseline
    * decoder works: marker walk, DQT/DHT collection, interleaved-MCU
    * Huffman entropy decode with byte unstuffing, dequantize +
    * dezigzag, separable floating IDCT, replication chroma upsampling,
    * JFIF YCbCr→RGB. Returns (width, height, top-down pixel bytes —
    * 1 byte/px grayscale, 3 bytes/px RGB) cropped to the SOF
    * dimensions; None when the payload is not such a JPEG. */
  def decodeJpeg(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < 4 || (payload(0) & 0xff) != 0xff ||
      (payload(1) & 0xff) != 0xd8) return None
    var pos = 2
    var width = 0
    var height = 0
    var comps: Array[JComp] = null
    var dcTables = Map.empty[Int, HuffTable]
    var acTables = Map.empty[Int, HuffTable]
    var dri = 0
    var sosAt = -1
    val quant = scala.collection.mutable.Map.empty[Int, Array[Int]]
    while (sosAt < 0) {
      if (pos + 4 > payload.length || (payload(pos) & 0xff) != 0xff) return None
      val m = payload(pos + 1) & 0xff
      if (m == 0xd9) return None // EOI before SOS
      val len = ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
      if (len < 2 || pos + 2 + len > payload.length) return None
      val body = payload.slice(pos + 4, pos + 2 + len)
      m match {
        case 0xdb => // DQT — possibly several tables per segment
          var o = 0
          while (o < body.length) {
            val pq = (body(o) & 0xf0) >> 4
            val tq = body(o) & 0x0f
            if (pq != 0 || o + 65 > body.length) return None // 8-bit only
            quant(tq) = Array.tabulate(64)(i => body(o + 1 + i) & 0xff)
            o += 65
          }
        case 0xc0 => // SOF0 baseline
          if (body.length < 6 || (body(0) & 0xff) != 8) return None
          height = ((body(1) & 0xff) << 8) | (body(2) & 0xff)
          width = ((body(3) & 0xff) << 8) | (body(4) & 0xff)
          val nComp = body(5) & 0xff
          if ((nComp != 1 && nComp != 3) || body.length < 6 + 3 * nComp) return None
          if (width <= 0 || height <= 0) return None
          comps = Array.tabulate(nComp) { j =>
            val o = 6 + 3 * j
            val c = new JComp(body(o) & 0xff,
              (body(o + 1) & 0xf0) >> 4, body(o + 1) & 0x0f, body(o + 2) & 0xff)
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2) return None
            c
          }
        case 0xc2 => // progressive DCT: its own scan-accumulating walk
          return decodeJpegProgressive(payload)
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
             0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // neither baseline nor progressive-Huffman frame
        case 0xc4 => // DHT — possibly several tables per segment
          var o = 0
          while (o < body.length) {
            val tc = (body(o) & 0xf0) >> 4
            val th = body(o) & 0x0f
            if (o + 17 > body.length) return None
            val bits = Array.tabulate(16)(i => body(o + 1 + i) & 0xff)
            val n = bits.sum
            if (o + 17 + n > body.length) return None
            val vals = Array.tabulate(n)(i => body(o + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables += th -> t
            else if (tc == 1) acTables += th -> t
            else return None
            o += 17 + n
          }
        case 0xdd => // DRI: restart interval in MCUs (0 disables)
          if (body.length < 2) return None
          dri = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
        case 0xda => // SOS
          if (comps == null) return None
          val ns = body(0) & 0xff
          if (ns != comps.length || body.length < 1 + 2 * ns + 3) return None
          for (j <- 0 until ns) {
            val cs = body(1 + 2 * j) & 0xff
            val c = comps.find(_.id == cs).getOrElse(return None)
            c.dcId = (body(2 + 2 * j) & 0xf0) >> 4
            c.acId = body(2 + 2 * j) & 0x0f
          }
          sosAt = pos + 2 + len
        case _ => () // APPn/COM/etc: skipped
      }
      pos += 2 + len
    }
    if (width == 0 || comps == null) return None
    for (c <- comps)
      if (!quant.contains(c.qId) || !dcTables.contains(c.dcId) ||
        !acTables.contains(c.acId)) return None
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    for (c <- comps) {
      c.planeW = mcusX * c.h * 8
      c.plane = new Array[Byte](c.planeW * mcusY * c.v * 8)
    }
    val br = new BitReader(payload, sosAt)
    val coefBuf = new Array[Int](64)
    val tmpBuf = new Array[Double](64)
    val prevDc = new Array[Int](comps.length)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          // expected RSTn (cyclic d0..d7): re-sync the reader, reset
          // every DC predictor — each restart segment decodes standalone
          val m = br.syncMarker()
          if (m != 0xd0 + ((mcu / dri - 1) % 8)) return None
          java.util.Arrays.fill(prevDc, 0)
        }
        mcu += 1
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var vv = 0
          while (vv < c.v) {
            var hh = 0
            while (hh < c.h) {
              val dc = decodeBlock(br, dcTables(c.dcId), acTables(c.acId),
                quant(c.qId), prevDc(ci), c.plane, c.planeW,
                mx * c.h + hh, my * c.v + vv, coefBuf, tmpBuf)
              if (dc == Int.MinValue) return None
              prevDc(ci) = dc
              hh += 1
            }
            vv += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    Some(finishJpegPlanes(comps, width, height, hMax, vMax))
  }

  /** Crop/convert decoded component planes to the output pixel bytes —
    * shared by the baseline and progressive paths: grayscale crops the
    * single plane; color runs JFIF YCbCr→RGB with replication
    * upsampling for subsampled chroma (source sample at
    * (x·h/hMax, y·v/vMax)). */
  private def finishJpegPlanes(comps: Array[JComp], width: Int, height: Int,
      hMax: Int, vMax: Int): (Int, Int, Array[Byte]) = {
    if (comps.length == 1) {
      val c = comps(0)
      val px = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(c.plane, y * c.planeW, px, y * width, width)
        y += 1
      }
      (width, height, px)
    } else {
      val Array(cy, cb, cr) = comps
      val px = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = (cy.plane((y * cy.v / vMax) * cy.planeW + x * cy.h / hMax) & 0xff).toDouble
          val cbv = (cb.plane((y * cb.v / vMax) * cb.planeW + x * cb.h / hMax) & 0xff) - 128.0
          val crv = (cr.plane((y * cr.v / vMax) * cr.planeW + x * cr.h / hMax) & 0xff) - 128.0
          val o = (y * width + x) * 3
          px(o) = math.max(0, math.min(255, math.round(yv + 1.402 * crv).toInt)).toByte
          px(o + 1) = math.max(0, math.min(255,
            math.round(yv - 0.344136 * cbv - 0.714136 * crv).toInt)).toByte
          px(o + 2) = math.max(0, math.min(255, math.round(yv + 1.772 * cbv).toInt)).toByte
          x += 1
        }
        y += 1
      }
      (width, height, px)
    }
  }

  /** Blocks per row of the JPEG fixture: 25 (matching the BMP/PNG pixel
    * width), so a JPEG payload is 200×(8·ceil(len/25)) px. */
  val JpegBlocksPerRow = 25

  /** Parse a PROGRESSIVE Huffman 8-bit JPEG (SOF2; grayscale or
    * 3-component, sampling up to 2×2): the multi-scan decode of T.81
    * Annex G. Coefficients accumulate in ZIGZAG order across scans —
    * DC first/refine (interleaved or single-component), AC
    * first/refine (single-component, band Ss..Se, successive
    * approximation via Al/Ah, EOB runs per G.1.2.2-3) — with Huffman
    * tables redefinable between scans and restart intervals honored
    * per scan; the IDCT runs ONCE at the end over the fully-refined
    * coefficients (dequantized, dezigzagged), then the shared
    * grayscale/color finish. None when the payload is not such a
    * JPEG. MultimodalSpec cross-checks against ImageIO on
    * JDK-written progressive files (spectral selection + successive
    * approximation as the standard encoder scripts emit them).
    */
  def decodeJpegProgressive(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < 4 || (payload(0) & 0xff) != 0xff ||
      (payload(1) & 0xff) != 0xd8) return None
    var pos = 2
    var width = 0
    var height = 0
    var comps: Array[JComp] = null
    // per-component zigzag coefficient store, MCU-padded geometry
    var coefs: Array[Array[Int]] = null
    var blocksW: Array[Int] = null // MCU-padded blocks per row
    var ndW: Array[Int] = null // non-interleaved (real) blocks per row
    var ndH: Array[Int] = null
    var mcusX = 0
    var mcusY = 0
    var hMax = 0
    var vMax = 0
    var dcTables = Map.empty[Int, HuffTable]
    var acTables = Map.empty[Int, HuffTable]
    var dri = 0
    val quant = scala.collection.mutable.Map.empty[Int, Array[Int]]
    var sawEoi = false

    while (!sawEoi) {
      if (pos + 2 > payload.length || (payload(pos) & 0xff) != 0xff) return None
      val m = payload(pos + 1) & 0xff
      if (m == 0xd9) { sawEoi = true }
      else {
        if (pos + 4 > payload.length) return None
        val len = ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
        if (len < 2 || pos + 2 + len > payload.length) return None
        val body = payload.slice(pos + 4, pos + 2 + len)
        var nextPos = pos + 2 + len
        m match {
          case 0xdb =>
            var o = 0
            while (o < body.length) {
              val pq = (body(o) & 0xf0) >> 4
              val tq = body(o) & 0x0f
              if (pq != 0 || o + 65 > body.length) return None
              quant(tq) = Array.tabulate(64)(i => body(o + 1 + i) & 0xff)
              o += 65
            }
          case 0xc2 =>
            if (comps != null) return None // one frame only
            if (body.length < 6 || (body(0) & 0xff) != 8) return None
            height = ((body(1) & 0xff) << 8) | (body(2) & 0xff)
            width = ((body(3) & 0xff) << 8) | (body(4) & 0xff)
            val nComp = body(5) & 0xff
            if ((nComp != 1 && nComp != 3) || body.length < 6 + 3 * nComp) return None
            if (width <= 0 || height <= 0) return None
            comps = Array.tabulate(nComp) { j =>
              val o = 6 + 3 * j
              val c = new JComp(body(o) & 0xff,
                (body(o + 1) & 0xf0) >> 4, body(o + 1) & 0x0f, body(o + 2) & 0xff)
              if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2) return None
              c
            }
            hMax = comps.map(_.h).max
            vMax = comps.map(_.v).max
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            blocksW = comps.map(c => mcusX * c.h)
            ndW = comps.map(c => ((width * c.h + hMax - 1) / hMax + 7) / 8)
            ndH = comps.map(c => ((height * c.v + vMax - 1) / vMax + 7) / 8)
            coefs = comps.map(c => new Array[Int](mcusX * c.h * mcusY * c.v * 64))
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None
          case 0xc4 =>
            var o = 0
            while (o < body.length) {
              val tc = (body(o) & 0xf0) >> 4
              val th = body(o) & 0x0f
              if (o + 17 > body.length) return None
              val bits = Array.tabulate(16)(i => body(o + 1 + i) & 0xff)
              val n = bits.sum
              if (o + 17 + n > body.length) return None
              val vals = Array.tabulate(n)(i => body(o + 17 + i) & 0xff)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTables += th -> t
              else if (tc == 1) acTables += th -> t
              else return None
              o += 17 + n
            }
          case 0xdd =>
            if (body.length < 2) return None
            dri = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
          case 0xda =>
            if (comps == null) return None
            val ns = body(0) & 0xff
            if (ns < 1 || ns > comps.length || body.length < 1 + 2 * ns + 3) return None
            val scanCompIdx = new Array[Int](ns)
            for (j <- 0 until ns) {
              val cs = body(1 + 2 * j) & 0xff
              val ci = comps.indexWhere(_.id == cs)
              if (ci < 0) return None
              scanCompIdx(j) = ci
              comps(ci).dcId = (body(2 + 2 * j) & 0xf0) >> 4
              comps(ci).acId = body(2 + 2 * j) & 0x0f
            }
            val ss = body(1 + 2 * ns) & 0xff
            val se = body(2 + 2 * ns) & 0xff
            val ah = (body(3 + 2 * ns) & 0xf0) >> 4
            val al = body(3 + 2 * ns) & 0x0f
            if (ss > 63 || se > 63 || se < ss) return None
            if (ss == 0 && se != 0) return None // DC scans carry DC only
            if (ss > 0 && ns != 1) return None // AC scans are single-component
            val end = decodeProgressiveScan(payload, pos + 2 + len, comps,
              scanCompIdx, coefs, blocksW, ndW, ndH, mcusX, mcusY,
              dcTables, acTables, dri, ss, se, ah, al)
            if (end < 0) return None
            nextPos = end
          case _ => ()
        }
        pos = nextPos
      }
    }
    if (comps == null || coefs == null) return None
    for (c <- comps) if (!quant.contains(c.qId)) return None

    // all scans accumulated: dequantize + dezigzag + IDCT every block
    val tmp = new Array[Double](64)
    val nat = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      c.planeW = mcusX * c.h * 8
      c.plane = new Array[Byte](c.planeW * mcusY * c.v * 8)
      val q = quant(c.qId)
      val bw = blocksW(ci)
      val bh = mcusY * c.v
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val base = (by * bw + bx) * 64
          java.util.Arrays.fill(nat, 0)
          var dcOnly = true
          var k = 0
          while (k < 64) {
            val v = coefs(ci)(base + k)
            if (v != 0) {
              nat(Zigzag(k)) = v * q(k)
              if (k > 0) dcOnly = false
            }
            k += 1
          }
          if (dcOnly) nat(0) = coefs(ci)(base) * q(0)
          idctToPlane(nat, dcOnly, c.plane, c.planeW, bx, by, tmp)
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    Some(finishJpegPlanes(comps, width, height, hMax, vMax))
  }

  /** Decode one progressive scan's entropy data, accumulating into the
    * zigzag coefficient stores; returns the byte offset of the next
    * marker after the scan (or -1 on corrupt data). Implements the
    * four scan kinds of T.81 G.2: DC first (diff << Al), DC refine
    * (one bit per block), AC first (band + EOB runs), AC refine
    * (correction bits, G.1.2.3). Restart intervals reset predictors
    * and the EOB run per segment. */
  private def decodeProgressiveScan(payload: Array[Byte], start: Int,
      comps: Array[JComp], scanCompIdx: Array[Int], coefs: Array[Array[Int]],
      blocksW: Array[Int], ndW: Array[Int], ndH: Array[Int],
      mcusX: Int, mcusY: Int,
      dcTables: Map[Int, HuffTable], acTables: Map[Int, HuffTable],
      dri: Int, ss: Int, se: Int, ah: Int, al: Int): Int = {
    val br = new BitReader(payload, start)
    val prevDc = new Array[Int](comps.length)
    var eobrun = 0
    var mcu = 0

    def restartIfDue(): Boolean = {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        val m = br.syncMarker()
        if (m != 0xd0 + ((mcu / dri - 1) % 8)) return false
        java.util.Arrays.fill(prevDc, 0)
        eobrun = 0
      }
      true
    }

    if (ss == 0) {
      // DC scan: interleaved MCU order when ns > 1, else the single
      // component's non-interleaved block raster
      def decodeDcAt(ci: Int, bx: Int, by: Int): Boolean = {
        val base = (by * blocksW(ci) + bx) * 64
        if (ah == 0) {
          val t = dcTables.getOrElse(comps(ci).dcId, return false)
          val s = t.decode(br)
          if (s < 0 || s > 15) return false
          prevDc(ci) += huffExtend(br.bits(s), s)
          coefs(ci)(base) = prevDc(ci) << al
        } else {
          if (br.bit() != 0) coefs(ci)(base) |= (1 << al)
        }
        !br.bad
      }
      if (scanCompIdx.length > 1) {
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            if (!restartIfDue()) return -1
            mcu += 1
            var j = 0
            while (j < scanCompIdx.length) {
              val ci = scanCompIdx(j)
              val c = comps(ci)
              var vv = 0
              while (vv < c.v) {
                var hh = 0
                while (hh < c.h) {
                  if (!decodeDcAt(ci, mx * c.h + hh, my * c.v + vv)) return -1
                  hh += 1
                }
                vv += 1
              }
              j += 1
            }
            mx += 1
          }
          my += 1
        }
      } else {
        val ci = scanCompIdx(0)
        var by = 0
        while (by < ndH(ci)) {
          var bx = 0
          while (bx < ndW(ci)) {
            if (!restartIfDue()) return -1
            mcu += 1
            if (!decodeDcAt(ci, bx, by)) return -1
            bx += 1
          }
          by += 1
        }
      }
    } else {
      // AC scan: single component, non-interleaved block raster
      val ci = scanCompIdx(0)
      val t = acTables.getOrElse(comps(ci).acId, return -1)
      val p1 = 1 << al
      val m1 = -1 << al
      var by = 0
      while (by < ndH(ci)) {
        var bx = 0
        while (bx < ndW(ci)) {
          if (!restartIfDue()) return -1
          mcu += 1
          val base = (by * blocksW(ci) + bx) * 64
          if (ah == 0) {
            // AC first scan (G.1.2.2): band values << Al, EOB runs
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              var done = false
              while (!done && k <= se) {
                val rs = t.decode(br)
                if (rs < 0) return -1
                val r = (rs >> 4) & 0xf
                val size = rs & 0xf
                if (size == 0) {
                  if (r < 15) {
                    eobrun = (1 << r) - 1
                    if (r > 0) eobrun += br.bits(r)
                    done = true
                  } else k += 16 // ZRL
                } else {
                  k += r
                  if (k > se) return -1
                  coefs(ci)(base + k) = huffExtend(br.bits(size), size) << al
                  k += 1
                }
              }
            }
          } else {
            // AC refinement scan (G.1.2.3, the libjpeg-documented
            // correction-bit algorithm over zero-history positions)
            var k = ss
            if (eobrun == 0) {
              var done = false
              while (!done && k <= se) {
                val rs = t.decode(br)
                if (rs < 0) return -1
                var r = (rs >> 4) & 0xf
                val size = rs & 0xf
                var newVal = 0
                if (size == 0) {
                  if (r < 15) {
                    eobrun = 1 << r
                    if (r > 0) eobrun += br.bits(r)
                    done = true
                  }
                  // r == 15: ZRL — skip 16 zero-history positions
                } else {
                  if (size != 1) return -1 // refinement emits ±1 only
                  newVal = if (br.bit() != 0) p1 else m1
                }
                if (!done) {
                  var placed = false
                  while (!placed && k <= se) {
                    val cur = coefs(ci)(base + k)
                    if (cur != 0) {
                      if (br.bit() != 0 && (cur & p1) == 0)
                        coefs(ci)(base + k) = cur + (if (cur >= 0) p1 else m1)
                      k += 1
                    } else {
                      if (r == 0) {
                        if (newVal != 0) coefs(ci)(base + k) = newVal
                        k += 1
                        placed = true
                      } else { r -= 1; k += 1 }
                    }
                  }
                }
              }
            }
            if (eobrun > 0) {
              // correction bits for the rest of the band
              while (k <= se) {
                val cur = coefs(ci)(base + k)
                if (cur != 0) {
                  if (br.bit() != 0 && (cur & p1) == 0)
                    coefs(ci)(base + k) = cur + (if (cur >= 0) p1 else m1)
                }
                k += 1
              }
              eobrun -= 1
            }
          }
          if (br.bad) return -1
          bx += 1
        }
        by += 1
      }
    }
    // scan done: find the next true marker (skip stuffing + stray RSTn)
    var p = br.position
    while (p + 1 < payload.length) {
      if ((payload(p) & 0xff) == 0xff) {
        val m2 = payload(p + 1) & 0xff
        if (m2 == 0x00 || m2 == 0xff) p += (if (m2 == 0x00) 2 else 1)
        else if (m2 >= 0xd0 && m2 <= 0xd7) p += 2
        else return p
      } else p += 1
    }
    -1
  }

  /** Wrap an id+text corpus as real media rows in a MIX of formats:
    * id%3==0 encodes as BMP, 1 as PNG (same 25-px width, pixels = the
    * document's text bytes), 2 as baseline JPEG (one constant 8×8
    * block per text byte — the DC-only construction that makes the
    * lossy format round-trip exactly). Every payload REALLY decodes;
    * the oracle predicts each geometry and pixel hash arithmetically.
    */
  def asMixedMedia(df: DataFrame, id: String, text: String,
      width: Int = BmpMediaWidth): DataFrame = {
    val encB = udf((t: String) => encodeBmp24(t.getBytes("UTF-8"), width))
    val encP = udf((t: String) => encodePng(t.getBytes("UTF-8"), width))
    val encJ = udf((t: String) => encodeJpegBlocks(t.getBytes("UTF-8"), JpegBlocksPerRow))
    // half the JPEG arm rides the PROGRESSIVE container (id%6==5):
    // both forms decode to identical pixels, so the oracle is
    // unchanged while the gate exercises the Annex G scan loop
    val encJP = udf((t: String) =>
      encodeJpegBlocksProgressive(t.getBytes("UTF-8"), JpegBlocksPerRow))
    df.select(
      col(id).cast("long").as("media_id"),
      when(col(id) % 3 === 0, encB(col(text)))
        .when(col(id) % 3 === 1, encP(col(text)))
        .when(col(id) % 6 === 2, encJ(col(text)))
        .otherwise(encJP(col(text))).as("payload"),
      when(col(id) % 3 === 0, lit("image/bmp"))
        .when(col(id) % 3 === 1, lit("image/png"))
        .otherwise(lit("image/jpeg")).as("mime"))
  }

  /** Wrap an id+text corpus as COLOR JPEG media rows: one constant
    * YCbCr 8×8 block per text byte ([[encodeJpegColorBlocks]]) — the
    * fixture that hash-gates the 3-component decode path end to end. */
  def asColorJpegMedia(df: DataFrame, id: String, text: String,
      blocksPerRow: Int = JpegBlocksPerRow): DataFrame = {
    val enc = udf((t: String) => encodeJpegColorBlocks(t.getBytes("UTF-8"), blocksPerRow))
    df.select(
      col(id).cast("long").as("media_id"),
      enc(col(text)).as("payload"),
      lit("image/jpeg").as("mime"))
  }

  // --- real pure-JVM WAV/RIFF audio codec --------------------------------

  /** Decoded audio record: container metadata plus per-channel PCM
    * stats — the audio analog of [[Decoded]]. Peak is max |sample|;
    * sum-of-squares is kept as an EXACT integer (the RMS numerator) so
    * the gate hash-compares without float drift; duration is integer
    * microseconds. */
  final case class AudioDecoded(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_us: Long,
      peak_left: Long,
      peak_right: Long,
      sumsq_left: Long,
      sumsq_right: Long)

  /** Per-channel stats of a parsed WAV. `peak`/`sumsq` are indexed by
    * channel (mono fills index 0 only); `dataHash` is the modular
    * rolling hash over the data chunk's raw bytes — the audio arm of
    * the content-hash provenance key. */
  final case class WavStats(sampleRate: Int, channels: Int, frames: Long,
      durationUs: Long, peak: Array[Long], sumsq: Array[Long], dataHash: Long)

  val WavSampleRate = 8000

  /** Encode text bytes as a stereo PCM16 WAV: interleaved sample i
    * (0-based) is `(byte_i - 96) * 256`, i over the first
    * 2·⌊len/2⌋ bytes (whole frames only) — a pure arithmetic mapping
    * a SQL oracle replays per character. The container is a real RIFF
    * walk: a junk LIST chunk sits between fmt and data, so a decoder
    * that doesn't chunk-skip properly fails loudly. ASCII-only input
    * (required) keeps every sample inside int16. */
  def encodeWavStereo(text: Array[Byte], sampleRate: Int = WavSampleRate,
      extraJunk: Boolean = false): Array[Byte] = {
    val n = (text.length / 2) * 2 // whole stereo frames
    val dataSize = n * 2 // 16-bit samples
    val listBody = "INFOgraft-pcm0".getBytes("US-ASCII") // even-sized junk
    require(listBody.length % 2 == 0, "junk chunk body must be even-sized")
    // container re-encode knob: a second filler chunk ('JUNK', the RIFF
    // spec's alignment id) changes the bytes without touching the PCM —
    // the duplicate class the audio near-dup fixture needs
    val junk2 = if (extraJunk) "graft-junk-pad".getBytes("US-ASCII")
                else Array.empty[Byte]
    require(junk2.length % 2 == 0, "junk chunk body must be even-sized")
    val riffSize = 4 + (8 + 16) + (8 + listBody.length) +
      (if (extraJunk) 8 + junk2.length else 0) + (8 + dataSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(sampleRate)
      .putInt(sampleRate * 2 * 2).putShort((2 * 2).toShort).putShort(16)
    out.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody)
    if (extraJunk)
      out.put("JUNK".getBytes("US-ASCII")).putInt(junk2.length).put(junk2)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) {
      val b = text(i) & 0xff
      require(b < 128, s"encodeWavStereo needs ASCII text, got byte $b")
      out.putShort(((b - 96) * 256).toShort)
      i += 1
    }
    out.array()
  }

  /** Parse a RIFF/WAVE container: generic chunk walk (unknown chunks
    * skipped with the odd-size pad rule), PCM 16-bit fmt validated,
    * per-channel peak/sum-of-squares computed streaming over the data
    * chunk — no sample array is retained. None when the payload is
    * not such a WAV. Duration is ⌊frames · 1e6 / rate⌋ micros. */
  def decodeWav(payload: Array[Byte]): Option[WavStats] = {
    if (payload.length < 12) return None
    def tag(off: Int) = new String(payload, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var channels = 0
    var sampleRate = 0
    var fmtOk = false
    var stats: Option[WavStats] = None
    while (pos + 8 <= payload.length && stats.isEmpty) {
      val id = tag(pos)
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > payload.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = buf.getShort(pos + 8).toInt
          channels = buf.getShort(pos + 10).toInt
          sampleRate = buf.getInt(pos + 12)
          val bits = buf.getShort(pos + 22).toInt
          fmtOk = audioFormat == 1 && bits == 16 &&
            (channels == 1 || channels == 2) && sampleRate > 0
        case "data" =>
          if (!fmtOk) return None // fmt must precede data
          val nSamples = size / 2
          val frames = nSamples / channels
          val peak = new Array[Long](channels)
          val sumsq = new Array[Long](channels)
          var h = 0L
          var s = 0
          while (s < frames * channels) {
            val v = buf.getShort(pos + 8 + s * 2).toLong
            val ch = s % channels
            val a = math.abs(v)
            if (a > peak(ch)) peak(ch) = a
            sumsq(ch) += v * v
            h = (h * 31 + (payload(pos + 8 + s * 2) & 0xff)) % 1000000007L
            h = (h * 31 + (payload(pos + 9 + s * 2) & 0xff)) % 1000000007L
            s += 1
          }
          stats = Some(WavStats(sampleRate, channels, frames,
            frames * 1000000L / sampleRate, peak, sumsq, h))
        case _ => () // junk chunk (LIST etc): skip
      }
      pos += 8 + size + (size & 1) // odd chunks pad to even
    }
    stats
  }

  /** The PCM payload itself (sample rate, channels, interleaved int16
    * samples) — the same chunk walk as [[decodeWav]], for consumers
    * that need the waveform rather than summary stats (spectral
    * features). */
  def decodeWavSamples(payload: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (payload.length < 12) return None
    def tag(off: Int) = new String(payload, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var channels = 0
    var sampleRate = 0
    var fmtOk = false
    var out: Option[(Int, Int, Array[Short])] = None
    while (pos + 8 <= payload.length && out.isEmpty) {
      val id = tag(pos)
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > payload.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = buf.getShort(pos + 8).toInt
          channels = buf.getShort(pos + 10).toInt
          sampleRate = buf.getInt(pos + 12)
          val bits = buf.getShort(pos + 22).toInt
          fmtOk = audioFormat == 1 && bits == 16 &&
            (channels == 1 || channels == 2) && sampleRate > 0
        case "data" =>
          if (!fmtOk) return None
          val n = (size / 2) / channels * channels // whole frames only
          val samples = new Array[Short](n)
          var s = 0
          while (s < n) { samples(s) = buf.getShort(pos + 8 + s * 2); s += 1 }
          out = Some((sampleRate, channels, samples))
        case _ => ()
      }
      pos += 8 + size + (size & 1)
    }
    out
  }

  /** One windowed Goertzel accumulation: the s[n] = x[n] + c·s[n−1] −
    * s[n−2] recurrence over xs[from, until), returning the bin power
    * s1² + s2² − c·s1·s2. With c = 2cos(ω) restricted to the INTEGER
    * coefficients {−1, 0, 1} (bins Fs/3, Fs/4, Fs/6) the whole filter
    * is exact 64-bit integer arithmetic — no float anywhere, so a SQL
    * oracle folds the identical recurrence. Power is |X(k)|² in
    * ℤ[e^iω], hence always ≥ 0. */
  private[graft] def goertzelPower(xs: Array[Short], from: Int, until: Int,
      coef: Long): Long = {
    var s1 = 0L
    var s2 = 0L
    var i = from
    while (i < until) {
      val s0 = xs(i) + coef * s1 - s2
      s2 = s1
      s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coef * s1 * s2
  }

  /** Per-channel spectral record: window count and total Goertzel
    * energies at the three integer-coefficient bins (Fs/6, Fs/4,
    * Fs/3). All integers — hash-gate comparable. */
  final case class AudioSpectral(media_id: Long, channel: Int,
      n_windows: Long, e_fs6: Long, e_fs4: Long, e_fs3: Long)

  /** Spectral feature extraction over WAV media — the step AFTER
    * parsing that makes the audio column useful for quality filtering
    * (tone detection, band energy ratios). The signal is framed into
    * `windowSize`-sample windows per channel (the standard short-time
    * analysis shape — and what bounds the integer Goertzel state:
    * |s| <= windowSize·32768, so powers stay far inside int64 at any
    * audio length) and the three integer-coefficient bins accumulate
    * per window; per-channel totals are exact integers. mapPartitions
    * decode, one streaming pass, no shuffle beyond the output rows. */
  def audioGoertzel(media: DataFrame, windowSize: Int = 200): Dataset[AudioSpectral] = {
    require(windowSize >= 2, s"windowSize must be >= 2, got $windowSize")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeWavSamples(payload).toSeq.flatMap { case (_, channels, inter) =>
            (0 until channels).map { ch =>
              val n = inter.length / channels
              val chan = new Array[Short](n)
              var i = 0
              while (i < n) { chan(i) = inter(i * channels + ch); i += 1 }
              val nW = (n + windowSize - 1) / windowSize
              var e1 = 0L // coef +1 -> Fs/6
              var e0 = 0L // coef  0 -> Fs/4
              var em = 0L // coef -1 -> Fs/3
              var w = 0
              while (w < nW) {
                val from = w * windowSize
                val until = math.min(n, from + windowSize)
                e1 += goertzelPower(chan, from, until, 1L)
                e0 += goertzelPower(chan, from, until, 0L)
                em += goertzelPower(chan, from, until, -1L)
                w += 1
              }
              AudioSpectral(id, ch, nW.toLong, e1, e0, em)
            }
          }
        }
      }
  }

  /** Per-window audio fingerprints — the acoustic-identity elements
    * audio near-dup matches on. Each channel is framed into
    * `windowSize`-sample windows and every window folds to one modular
    * rolling hash over its PCM values, SEEDED with channel+1 so the
    * two channels of a stereo file can never alias (sample values are
    * shifted by +32768 into [0, 65535] before the fold, keeping the
    * modular state non-negative). Position (window_idx) is reported
    * but deliberately NOT part of the hash: a trimmed or re-cut copy
    * shares its surviving windows' fingerprints verbatim, which is
    * what makes set-Jaccard over `whash` recognize it. One streaming
    * mapPartitions pass, no shuffle beyond the output rows — the
    * fingerprint table is the corpus's audio inverted-index input at
    * any scale. */
  def audioFingerprints(media: DataFrame, windowSize: Int = 50): DataFrame = {
    require(windowSize >= 2, s"windowSize must be >= 2, got $windowSize")
    val spark = media.sparkSession
    import spark.implicits._
    val P = 1000000007L
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeWavSamples(payload).toSeq.flatMap { case (_, channels, inter) =>
            val n = inter.length / channels
            val nW = (n + windowSize - 1) / windowSize
            (0 until channels).flatMap { ch =>
              (0 until nW).map { w =>
                val from = w * windowSize
                val until = math.min(n, from + windowSize)
                var h = (ch + 1).toLong
                var i = from
                while (i < until) {
                  h = (h * 31 + (inter(i * channels + ch) + 32768)) % P
                  i += 1
                }
                (id, ch.toLong, w.toLong, nW.toLong, h)
              }
            }
          }
        }
      }
      .toDF("media_id", "channel", "window_idx", "n_windows", "whash")
  }

  /** Re-encoded-audio fixture for near-dup over the AUDIO modality —
    * the WAV twin of [[asRencodedVideoMedia]]: each document lands
    * THREE times (media_id = id*4 + v). v0 the plain stereo PCM16
    * WAV, v1 the SAME samples behind a container re-encode (an extra
    * JUNK filler chunk between fmt and data — byte-different payload,
    * identical PCM), v2 a TRIMMED copy (the tail cut so each channel
    * loses exactly its last `windowSize`-sample window when it has
    * ≥ 2; shorter signals keep the full text, an exact duplicate).
    * Samples remain the pure (byte−96)·256 arithmetic of the text, so
    * the near-dup oracle replays every window fingerprint in closed
    * form. */
  def asRencodedAudioMedia(df: DataFrame, id: String, text: String,
      windowSize: Int = 50): DataFrame = {
    val enc = udf { (t: String, v: Int) =>
      val full = t.getBytes("US-ASCII")
      val n0 = full.length / 2 // samples per channel
      val nW0 = (n0 + windowSize - 1) / windowSize
      val bytes = if (v == 2 && nW0 >= 2) full.take(2 * windowSize * (nW0 - 1))
                  else full
      encodeWavStereo(bytes, extraJunk = v == 1)
    }
    df.select(col(id).cast("long").as("_did"), col(text).as("_t"))
      .select(col("_did"), col("_t"),
        explode(array(lit(0), lit(1), lit(2))).as("_v"))
      .select((col("_did") * 4 + col("_v")).as("media_id"),
        enc(col("_t"), col("_v")).as("payload"),
        lit("audio/wav").as("mime"))
  }

  /** Wrap an id+text corpus as real WAV media rows — the audio arm of
    * the multimodal fixture family. */
  def asWavMedia(df: DataFrame, id: String, text: String): DataFrame = {
    val enc = udf((t: String) => encodeWavStereo(t.getBytes("US-ASCII")))
    df.select(
      col(id).cast("long").as("media_id"),
      enc(col(text)).as("payload"),
      lit("audio/wav").as("mime"))
  }

  /** Batch audio decode: the same mapPartitions shape as [[decode]]
    * (codec init once per partition, rows streamed). Payloads that are
    * not PCM16 WAVs are dropped — in a real pipeline they'd route to a
    * quarantine sink, which is a filter on the same plan. */
  def decodeAudio(media: DataFrame): Dataset[AudioDecoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeWav(payload).map { w =>
            AudioDecoded(id, w.sampleRate, w.channels, w.frames, w.durationUs,
              w.peak(0), if (w.channels > 1) w.peak(1) else 0L,
              w.sumsq(0), if (w.channels > 1) w.sumsq(1) else 0L)
          }
        }
      }
  }

  // --- real pure-JVM AVI/MJPEG video codec -------------------------------

  /** Parsed MJPEG video: container timing, the TOTAL frame-chunk
    * count, and the decoded frames that survived sampling — each as
    * (frame index, width, height, pixel bytes). */
  final case class AviVideo(width: Int, height: Int, microSecPerFrame: Long,
      totalFrames: Int, frames: Vector[(Int, Int, Int, Array[Byte])])

  val AviMicroSecPerFrame = 100000L // 10 fps fixture timing

  /** Encode JPEG payloads as a minimal spec-shaped AVI container:
    * RIFF('AVI ') → LIST(hdrl){ avih, LIST(strl){ strh 'vids'/'MJPG',
    * strf BITMAPINFOHEADER } } → LIST(movi){ '00dc' frame... }. Each
    * frame chunk holds one complete JPEG file (the MJPEG convention).
    * Odd-sized frames pad per the RIFF rule. */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
      microSecPerFrame: Long = AviMicroSecPerFrame,
      withJunk: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    def dw(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def w16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fcc(id) ++ dw(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(kind) ++ body)
    val avih = dw(microSecPerFrame) ++ dw(0) ++ dw(0) ++ dw(0) ++
      dw(frames.length.toLong) ++ dw(0) ++ dw(1) ++ dw(0) ++
      dw(width.toLong) ++ dw(height.toLong) ++ dw(0) ++ dw(0) ++ dw(0) ++ dw(0)
    val strh = fcc("vids") ++ fcc("MJPG") ++ dw(0) ++ w16(0) ++ w16(0) ++
      dw(0) ++ dw(1) ++ dw(1000000L / math.max(1L, microSecPerFrame)) ++
      dw(0) ++ dw(frames.length.toLong) ++ dw(0) ++ dw(0) ++ dw(0) ++
      w16(0) ++ w16(0) ++ w16(width) ++ w16(height)
    val strf = dw(40) ++ dw(width.toLong) ++ dw(height.toLong) ++ w16(1) ++
      w16(24) ++ fcc("MJPG") ++ dw(width.toLong * height * 3) ++
      dw(0) ++ dw(0) ++ dw(0) ++ dw(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    // JUNK is the RIFF spec's alignment-filler chunk id: a compliant
    // reader must skip it. The odd body length also exercises the
    // pad-byte rule on the walk between hdrl and movi.
    val junk = if (withJunk) chunk("JUNK", Array.fill(37)(0x4a.toByte))
               else Array.empty[Byte]
    val riffBody = fcc("AVI ") ++ hdrl ++ junk ++ movi
    fcc("RIFF") ++ dw(riffBody.length.toLong) ++ riffBody
  }

  /** Parse a RIFF/AVI MJPEG container: recursive chunk walk (LIST
    * nesting, odd-size pad rule), avih for timing/frame count, every
    * '00dc'/'00db' movi chunk decoded through [[decodeJpeg]]. None
    * when the payload is not such an AVI or any frame fails to
    * decode. */
  def decodeAvi(payload: Array[Byte]): Option[AviVideo] =
    decodeAviSampled(payload, stride = 1)

  /** [[decodeAvi]] with the frame-sampling pushed INTO the decode:
    * only every `stride`-th frame's pixels are Huffman-decoded; the
    * container walk still counts every frame chunk (so frame totals
    * and timing are exact). Sampling at decode time is the scale
    * point — at stride s the per-payload codec work drops by s×, not
    * just the output rows. Sampled-out positions are absent from
    * `frames`' companion index list. */
  def decodeAviSampled(payload: Array[Byte], stride: Int): Option[AviVideo] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    if (payload.length < 12) return None
    def tag(off: Int) = new String(payload, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    def dw(off: Int): Long =
      (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    var avih: Option[Int] = None // offset of the avih body
    val frameChunks = Vector.newBuilder[(Int, Int)] // (offset, size)
    def walk(from: Int, to: Int): Boolean = {
      var pos = from
      while (pos + 8 <= to) {
        val id = tag(pos)
        val size = dw(pos + 4).toInt
        if (size < 0 || pos + 8 + size > to) return false
        id match {
          case "LIST" =>
            if (size < 4) return false
            if (!walk(pos + 12, pos + 8 + size)) return false
          case "avih" => if (avih.isEmpty) avih = Some(pos + 8)
          case "00dc" | "00db" => frameChunks += ((pos + 8, size))
          case _ => ()
        }
        pos += 8 + size + (size & 1)
      }
      true
    }
    if (!walk(12, payload.length)) return None
    val a = avih.getOrElse(return None)
    if (a + 40 > payload.length) return None
    val usPerFrame = dw(a)
    val width = dw(a + 32).toInt
    val height = dw(a + 36).toInt
    val chunks = frameChunks.result()
    val decoded = chunks.zipWithIndex.collect {
      case ((off, size), idx) if idx % stride == 0 =>
        val (fw, fh, px) = decodeJpeg(
          java.util.Arrays.copyOfRange(payload, off, off + size))
          .getOrElse(return None)
        (idx, fw, fh, px)
    }
    Some(AviVideo(width, height, usPerFrame, chunks.length, decoded))
  }

  /** Wrap an id+text corpus as MJPEG AVI media rows: the text splits
    * into 25-char frames, each a one-block-row constant-block JPEG
    * ([[encodeJpegBlocks]]) — so every sampled frame's decoded pixels
    * (and hash) are a pure arithmetic function of its text slice, the
    * closed form the video gate's oracle replays. */
  def asAviMedia(df: DataFrame, id: String, text: String): DataFrame = {
    val enc = udf { (t: String) =>
      val bytes = t.getBytes("UTF-8")
      val n = math.max(1, (bytes.length + JpegBlocksPerRow - 1) / JpegBlocksPerRow)
      val frames = (0 until n).map { f =>
        encodeJpegBlocks(
          bytes.slice(f * JpegBlocksPerRow,
            math.min((f + 1) * JpegBlocksPerRow, bytes.length)),
          JpegBlocksPerRow)
      }
      encodeAviMjpeg(frames, JpegBlocksPerRow * 8, 8)
    }
    df.select(
      col(id).cast("long").as("media_id"),
      enc(col(text)).as("payload"),
      lit("video/x-msvideo").as("mime"))
  }

  /** Re-encoded-video fixture for near-dup over the VIDEO modality:
    * each document lands THREE times (media_id = id*4 + v) — v0 the
    * plain MJPEG AVI of the text, v1 the SAME frames behind a
    * container re-encode (a RIFF JUNK filler chunk between hdrl and
    * movi: byte-different payload, pixel-identical frames — the
    * container-swap duplicate class), v2 a TRIMMED copy (the last
    * 25-char frame slice dropped when the text spans ≥ 2 frames — the
    * cut/short-version duplicate class; single-frame texts keep the
    * full text, an exact duplicate). Frame pixel streams remain a pure
    * arithmetic function of the text slice, so the near-dup oracle
    * replays every frame fingerprint in closed form.
    */
  def asRencodedVideoMedia(df: DataFrame, id: String, text: String): DataFrame = {
    val enc = udf { (t: String, v: Int) =>
      val full = t.getBytes("UTF-8")
      val n0 = math.max(1, (full.length + JpegBlocksPerRow - 1) / JpegBlocksPerRow)
      val bytes = if (v == 2 && n0 >= 2) full.take(JpegBlocksPerRow * (n0 - 1)) else full
      val n = math.max(1, (bytes.length + JpegBlocksPerRow - 1) / JpegBlocksPerRow)
      val frames = (0 until n).map { f =>
        encodeJpegBlocks(
          bytes.slice(f * JpegBlocksPerRow,
            math.min((f + 1) * JpegBlocksPerRow, bytes.length)),
          JpegBlocksPerRow)
      }
      encodeAviMjpeg(frames, JpegBlocksPerRow * 8, 8, withJunk = v == 1)
    }
    df.select(col(id).cast("long").as("_did"), col(text).as("_t"))
      .select(col("_did"), col("_t"),
        explode(array(lit(0), lit(1), lit(2))).as("_v"))
      .select((col("_did") * 4 + col("_v")).as("media_id"),
        enc(col("_t"), col("_v")).as("payload"),
        lit("video/x-msvideo").as("mime"))
  }

  /** Batch video decode with frame sampling fused in: one output row
    * per kept frame (`frame_idx % stride == 0`) carrying the frame's
    * decoded dims and content hash — the decode + frame-sample fan-out
    * a frame-level training pipeline needs, in the same mapPartitions
    * shape as [[decode]] (container parsed once, only sampled frames'
    * hashes computed). */
  def decodeVideoFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeAviSampled(payload, stride).toSeq.flatMap { v =>
            v.frames.map { case (idx, fw, fh, px) =>
              var h = 0L
              var i = 0
              while (i < px.length) { h = (h * 31 + (px(i) & 0xff)) % 1000000007L; i += 1 }
              (id, idx, v.totalFrames, v.microSecPerFrame, fw, fh, h)
            }
          }
        }
      }
      .toDF("media_id", "frame_idx", "n_frames", "us_per_frame",
        "width", "height", "frame_hash")
  }

  /** The codec behind [[decode]]: sniff the magic bytes, real-parse
    * what we can (BMP, PNG, baseline JPEG) and extract PCM stats from
    * WAV/RIFF audio; stub the rest (video). For audio the Decoded
    * record carries (channels, sample-rate-in-hundreds) as the
    * "dimensions", frame count as n_frames, and the rolling hash runs
    * over the raw PCM data bytes — so an audio payload in a mixed
    * corpus produces honest metadata instead of silently stubbing.
    * Content hash is the rolling modular hash of the DECODED
    * pixel/PCM bytes (so a decode bug is a hash-gate failure);
    * features derive from the hash as in the stub.
    */
  private[operators] def sniffDecode(payload: Array[Byte]): (Int, Int, Int, Long, Array[Float]) =
    decodeBmp(payload).orElse(decodePng(payload)).orElse(decodeJpeg(payload)) match {
      case Some((w, h, pixels)) =>
        var hash = 0L
        var i = 0
        while (i < pixels.length) { hash = (hash * 31 + (pixels(i) & 0xff)) % 1000000007L; i += 1 }
        val features = Array.tabulate(FeatureDim) { k =>
          ((hash >> (k * 3)) & 0xff).toFloat / 255f
        }
        (w, h, 1, hash, features)
      case None => decodeWav(payload) match {
        case Some(wav) =>
          // audio arm: honest metadata in the image-shaped record —
          // channels and rate/100 as "dimensions", frames as frames,
          // content hash over the PCM data bytes
          val features = Array.tabulate(FeatureDim) { k =>
            ((wav.dataHash >> (k * 3)) & 0xff).toFloat / 255f
          }
          (wav.channels, wav.sampleRate / 100,
            wav.frames.min(Int.MaxValue).toInt, wav.dataHash, features)
        case None => decodeAvi(payload) match {
          case Some(v) =>
            // video arm: container dims, frame count, content hash
            // over the concatenated decoded frame pixel streams
            var h = 0L
            v.frames.foreach { case (_, _, _, px) =>
              var i = 0
              while (i < px.length) { h = (h * 31 + (px(i) & 0xff)) % 1000000007L; i += 1 }
            }
            val features = Array.tabulate(FeatureDim) { k =>
              ((h >> (k * 3)) & 0xff).toFloat / 255f
            }
            (v.width, v.height, v.totalFrames, h, features)
          case None => stubDecode(payload)
        }
      }
    }

  /** Batch decode: mapPartitions over (media_id, payload) so a real
    * codec pays its initialization once per partition and streams rows
    * — the standard shape for vectorized decode at 100 TB (no
    * collect, no per-row setup, arbitrary partition counts).
    */
  def decode(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codec: init decoder/context HERE, once per partition
        rows.map { case (id, payload) =>
          val (w, h, f, hash, feat) = sniffDecode(payload)
          Decoded(id, w, h, f, hash, feat)
        }
      }
  }

  /** Resize metadata transform (pure column math over decoded rows):
    * scales dimensions to fit a bounding box, preserving aspect ratio
    * via integer arithmetic. A real pipeline would re-encode pixels in
    * the same mapPartitions pass; the planning shape is identical.
    */
  def resizeToFit(decoded: Dataset[Decoded], maxSide: Int): DataFrame =
    decoded.toDF()
      .withColumn("_scale_num", lit(maxSide))
      .withColumn("_scale_den", greatest(col("width"), col("height"), lit(maxSide)))
      .select(
        col("media_id"),
        (col("width") * col("_scale_num") / col("_scale_den")).cast("int").as("width"),
        (col("height") * col("_scale_num") / col("_scale_den")).cast("int").as("height"),
        col("n_frames"),
        col("features"))

  /** Frame sampling for video-like payloads: keep every `stride`-th
    * frame index — one output row per sampled frame (posexplode), the
    * fan-out shape frame-level training data needs.
    */
  def sampleFrames(decoded: Dataset[Decoded], stride: Int): DataFrame =
    decoded.toDF()
      .select(col("media_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1)))
      .filter(col("pos") % stride === 0)
      .select(col("media_id"), col("col").as("frame_idx"), col("n_frames"))

  // --- perceptual hash (pHash) for image near-dup -------------------------

  /** Fixed-point scale for the pHash DCT cosine table (2^14: 64
    * coefficients of |L|≤255 over a 32×32 grid stay far inside int64 —
    * max |F| < 255·2^28·2^10 ≈ 7·10^16). */
  val PhashScale = 16384L

  /** Integer-scaled DCT-II cosine table C(p)(u) =
    * round(cos(π(2u+1)p/64)·2^14), p < 8 (the retained low-frequency
    * block), u < 32 (the downsampled grid). The constants are computed
    * ONCE here and inlined verbatim into the DuckDB oracle — both
    * engines fold the identical integers, so the hash is bit-portable
    * with no transcendental in either hot path. */
  val PhashCosTable: Array[Array[Long]] = Array.tabulate(8, 32) { (p, u) =>
    math.round(math.cos(math.Pi * (2 * u + 1) * p / 64.0) * PhashScale)
  }

  /** 64-bit perceptual hash of a decoded 3-channel pixel stream — the
    * classic pHash construction (Zauner 2010; the ImageHash/pHash.org
    * formulation), re-derived in INTEGER-EXACT arithmetic so the same
    * hash is replayable by a SQL engine:
    *
    *  1. luma:   l = (77·c2 + 150·c1 + 29·c0) >> 8 per pixel (the
    *             integer Rec.601 weights over the stream's channel
    *             triplets);
    *  2. resize: 32×32 box-average downsample with floor boundaries
    *             x0 = u·W/32, x1 = max((u+1)·W/32, x0+1) (degenerate
    *             dimensions < 32 repeat rows/columns — every image
    *             lands on the same grid);
    *  3. DCT:    the 8×8 low-frequency block of the 2-D DCT-II,
    *             computed separably over [[PhashCosTable]] (integer
    *             multiplication distributes exactly, so row-then-
    *             column equals the double sum bit for bit);
    *  4. hash:   bit k = p·8+q set iff F(p,q) > upper-median of the
    *             64 coefficients (sorted index 32 — deterministic, no
    *             mean drift).
    *
    * Identical pixels (a PNG re-encode of a BMP, a lossless crop
    * round-trip) hash identically; small pixel perturbations move few
    * bits, so near-duplicates sit at small Hamming distance — the
    * property [[graft.operators.Dedup.hammingPairs]]' pigeonhole
    * blocking turns into a scalable pair scan. */
  def phash64(pixels: Array[Byte], width: Int, height: Int): Long = {
    require(width > 0 && height > 0 && pixels.length >= 3 * width * height,
      s"phash64 needs a full 3-channel $width x $height stream, " +
        s"got ${pixels.length} bytes")
    val lum = new Array[Long](width * height)
    var i = 0
    while (i < lum.length) {
      lum(i) = (77L * (pixels(3 * i + 2) & 0xff) +
        150L * (pixels(3 * i + 1) & 0xff) +
        29L * (pixels(3 * i) & 0xff)) >> 8
      i += 1
    }
    val down = new Array[Long](32 * 32)
    var v = 0
    while (v < 32) {
      val y0 = v * height / 32
      val y1 = math.max((v + 1) * height / 32, y0 + 1)
      var u = 0
      while (u < 32) {
        val x0 = u * width / 32
        val x1 = math.max((u + 1) * width / 32, x0 + 1)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += lum(y * width + x); x += 1 }
          y += 1
        }
        down(v * 32 + u) = s / ((y1 - y0).toLong * (x1 - x0))
        u += 1
      }
      v += 1
    }
    // separable DCT: row pass g(p)(v) = Σ_u down(v,u)·C(p)(u), then
    // column pass f(p·8+q) = Σ_v g(p)(v)·C(q)(v)
    val g = new Array[Long](8 * 32)
    var p = 0
    while (p < 8) {
      val cp = PhashCosTable(p)
      v = 0
      while (v < 32) {
        var s = 0L
        var u = 0
        while (u < 32) { s += down(v * 32 + u) * cp(u); u += 1 }
        g(p * 32 + v) = s
        v += 1
      }
      p += 1
    }
    val f = new Array[Long](64)
    p = 0
    while (p < 8) {
      var q = 0
      while (q < 8) {
        val cq = PhashCosTable(q)
        var s = 0L
        v = 0
        while (v < 32) { s += g(p * 32 + v) * cq(v); v += 1 }
        f(p * 8 + q) = s
        q += 1
      }
      p += 1
    }
    val med = f.sorted.apply(32)
    var h = 0L
    var k = 0
    while (k < 64) { if (f(k) > med) h |= 1L << k; k += 1 }
    h
  }

  /** Batch pHash over a media table: mapPartitions decode (the same
    * per-partition-init shape as [[decode]]) → [[phash64]] on the
    * decoded pixels. Non-image payloads (audio, video, opaque bytes)
    * are dropped — a perceptual IMAGE hash for them would be
    * meaningless, and the near-dup pair scan must not pair them.
    * Output: (media_id, width, height, phash). */
  def phash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeBmp(payload).orElse(decodePng(payload))
            .orElse(decodeJpeg(payload))
            .map { case (w, h, px) => (id, w, h, phash64(px, w, h)) }
        }
      }
      .toDF("media_id", "width", "height", "phash")
  }

  /** Re-encoded-duplicate fixture for the pHash gate: THREE media rows
    * per document — the document's pixel matrix as a BMP (v=0) and as
    * a PNG (v=1), which decode to the IDENTICAL byte stream (the
    * dominant crawled-corpus duplicate class: same image, different
    * container), plus a lightly PERTURBED BMP (v=2: every 7th text
    * byte XOR 1 — a few low-order luma flips, the re-compressed
    * near-duplicate class). media_id = doc_id·4 + v keeps the variant
    * recoverable by arithmetic in both engines. */
  def asRencodedMedia(df: DataFrame, id: String, text: String,
      width: Int = BmpMediaWidth): DataFrame = {
    val encB = udf((t: String) => encodeBmp24(t.getBytes("UTF-8"), width))
    val encP = udf((t: String) => encodePng(t.getBytes("UTF-8"), width))
    val encX = udf { (t: String) =>
      val b = t.getBytes("UTF-8")
      var j = 0
      while (j < b.length) { b(j) = (b(j) ^ 1).toByte; j += 7 }
      encodeBmp24(b, width)
    }
    df.select(col(id).cast("long").as("doc"), col(text).as("t"))
      .select(col("doc"), col("t"),
        explode(array(lit(0), lit(1), lit(2))).as("v"))
      .select(
        (col("doc") * 4 + col("v")).as("media_id"),
        when(col("v") === 0, encB(col("t")))
          .when(col("v") === 1, encP(col("t")))
          .otherwise(encX(col("t"))).as("payload"),
        when(col("v") === 1, lit("image/png"))
          .otherwise(lit("image/bmp")).as("mime"))
  }
}
