package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The multimodal plumbing must be deterministic and partition-count
  * invariant (the mapPartitions codec shape cannot leak batch
  * boundaries into results), with stable schema.
  */
class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.asMedia(
    Tables.documents(spark, sf("sf0.001")).limit(100), "doc_id", "text")

  test("asMedia produces binary payload + typed metadata") {
    val m = media
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.schema("mime").dataType.typeName == "string")
    assert(m.count() == 100)
  }

  test("decode is deterministic and partition-count invariant") {
    val d1 = Multimodal.decode(media.repartition(1)).collect().sortBy(_.media_id)
    val d4 = Multimodal.decode(media.repartition(7)).collect().sortBy(_.media_id)
    assert(d1.length == d4.length)
    d1.zip(d4).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.width == b.width && a.height == b.height)
      assert(a.features.toSeq == b.features.toSeq)
    }
    assert(d1.forall(_.features.length == Multimodal.FeatureDim))
    assert(d1.forall(d => d.width > 0 && d.height > 0 && d.n_frames > 0))
  }

  test("resizeToFit preserves aspect ratio within a bounding box") {
    val decoded = Multimodal.decode(media)
    val resized = Multimodal.resizeToFit(decoded, maxSide = 128).collect()
    assert(resized.forall(r => r.getAs[Int]("width") <= 128 && r.getAs[Int]("height") <= 128))
    // scaling never enlarges (den = max(width, height, maxSide))
    val orig = decoded.collect().map(d => d.media_id -> d).toMap
    resized.foreach { r =>
      val o = orig(r.getAs[Long]("media_id"))
      assert(r.getAs[Int]("width") <= o.width && r.getAs[Int]("height") <= o.height)
    }
  }

  test("sampleFrames keeps every stride-th frame index") {
    val decoded = Multimodal.decode(media)
    val frames = Multimodal.sampleFrames(decoded, stride = 3)
    val rows = frames.collect()
    assert(rows.forall(_.getAs[Int]("frame_idx") % 3 == 0))
    val perDoc = rows.groupBy(_.getAs[Long]("media_id"))
    val nFrames = decoded.collect().map(d => d.media_id -> d.n_frames).toMap
    perDoc.foreach { case (id, rs) =>
      assert(rs.length == (nFrames(id) + 2) / 3) // ceil(n/3)
    }
  }

  test("BMP codec round-trips: encode -> decode recovers dims and padded pixel bytes") {
    import graft.operators.Multimodal
    // odd width => every row carries stride padding the decoder must strip
    val pixels = Array.tabulate(200)(i => (i % 251).toByte)
    val bmp = Multimodal.encodeBmp24(pixels, width = 25)
    val Some((w, h, decoded)) = Multimodal.decodeBmp(bmp)
    assert(w == 25 && h == 3) // ceil(200 / 75) rows
    assert(decoded.length == 3 * 75)
    assert(decoded.take(200).sameElements(pixels))
    assert(decoded.drop(200).forall(_ == 0)) // last-row zero fill
    // exact single row, no fill
    val one = Array.tabulate(75)(_.toByte)
    val Some((_, h1, d1)) = Multimodal.decodeBmp(Multimodal.encodeBmp24(one, 25))
    assert(h1 == 1 && d1.sameElements(one))
  }

  test("BMP decoder handles top-down row order and rejects non-BMP payloads") {
    import graft.operators.Multimodal
    val pixels = Array.tabulate(150)(i => (i + 1).toByte)
    val bmp = Multimodal.encodeBmp24(pixels, width = 25)
    // flip to top-down: negate height and reverse the stored rows
    val stride = 76
    val buf = java.nio.ByteBuffer.wrap(bmp.clone()).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -2)
    val flipped = buf.array()
    val rows = (0 until 2).map(r => bmp.slice(54 + r * stride, 54 + (r + 1) * stride))
    rows.reverse.zipWithIndex.foreach { case (row, r) =>
      System.arraycopy(row, 0, flipped, 54 + r * stride, stride)
    }
    val Some((_, hTd, dTd)) = Multimodal.decodeBmp(flipped)
    assert(hTd == 2 && dTd.sameElements(pixels))
    // sniffing: truncated / foreign payloads fall through to None
    assert(Multimodal.decodeBmp("not a bitmap".getBytes).isEmpty)
    assert(Multimodal.decodeBmp(bmp.take(40)).isEmpty)
    // 8bpp (unsupported) rejected: corrupt the bpp field
    val bad = java.nio.ByteBuffer.wrap(bmp.clone()).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.putShort(28, 8)
    assert(Multimodal.decodeBmp(bad.array()).isEmpty)
  }

  test("asBmpMedia payloads really decode through the sniffing codec") {
    import graft.operators.Multimodal
    import spark.implicits._
    val docs = Seq((1L, "a" * 10), (2L, "b" * 75), (3L, "c" * 151)).toDF("doc_id", "text")
    val out = Multimodal.decode(Multimodal.asBmpMedia(docs, "doc_id", "text"))
      .collect().map(d => d.media_id -> d).toMap
    assert(out(1L).width == 25 && out(1L).height == 1)
    assert(out(2L).width == 25 && out(2L).height == 1)
    assert(out(3L).width == 25 && out(3L).height == 3) // ceil(151/75)
    assert(out.values.forall(_.n_frames == 1))
    // content hash is over DECODED pixels: text bytes + zero fill
    def roll(bytes: Seq[Int]): Long =
      bytes.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    val expect3 = roll(Seq.fill(151)('c'.toInt) ++ Seq.fill(3 * 75 - 151)(0))
    assert(out(3L).content_hash == expect3)
  }

  test("PNG codec round-trips: encode -> inflate -> unfilter recovers padded pixel bytes") {
    import graft.operators.Multimodal
    val pixels = Array.tabulate(200)(i => (i % 251).toByte)
    val png = Multimodal.encodePng(pixels, width = 25)
    assert(png.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val Some((w, h, decoded)) = Multimodal.decodePng(png)
    assert(w == 25 && h == 3)
    assert(decoded.take(200).sameElements(pixels))
    assert(decoded.drop(200).forall(_ == 0))
    // BMP and PNG of the same logical pixels decode identically
    val Some((_, _, viaBmp)) = Multimodal.decodeBmp(Multimodal.encodeBmp24(pixels, 25))
    assert(decoded.sameElements(viaBmp))
  }

  test("PNG decoder reconstructs Sub/Up/Average/Paeth filtered scanlines") {
    import graft.operators.Multimodal
    // hand-build a 2x3 RGB image and re-encode its raw stream with
    // every nontrivial filter, one per row set, via a tiny re-filterer
    val width = 2; val rowBytes = width * 3; val height = 4
    val pixels = Array.tabulate(height * rowBytes)(i => ((i * 37 + 11) % 256).toByte)
    def pix(r: Int, i: Int): Int =
      if (r < 0 || i < 0) 0 else pixels(r * rowBytes + i) & 0xff
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val filters = Array(1, 2, 3, 4) // Sub, Up, Average, Paeth
    val raw = new java.io.ByteArrayOutputStream
    for (r <- 0 until height) {
      val ft = filters(r)
      raw.write(ft)
      for (i <- 0 until rowBytes) {
        val x = pix(r, i)
        val left = if (i >= 3) pix(r, i - 3) else 0
        val up = pix(r - 1, i)
        val ul = if (i >= 3) pix(r - 1, i - 3) else 0
        val f = ft match {
          case 1 => x - left
          case 2 => x - up
          case 3 => x - (left + up) / 2
          case 4 => x - paeth(left, up, ul)
        }
        raw.write(f & 0xff)
      }
    }
    // deflate and wrap in the same chunk structure encodePng emits
    val template = Multimodal.encodePng(pixels, width)
    val deflater = new java.util.zip.Deflater
    deflater.setInput(raw.toByteArray); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    // rebuild: signature + IHDR copied from template, new IDAT, IEND
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32; crc.update(t); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt).array()
    }
    val ihdr = template.slice(8, 8 + 25) // length+type+13+crc
    val rebuilt = template.take(8) ++ ihdr ++
      chunk("IDAT", comp.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
    val Some((_, hh, decoded)) = Multimodal.decodePng(rebuilt)
    assert(hh == height && decoded.sameElements(pixels))
    // corrupted CRC rejected
    val broken = rebuilt.clone(); broken(broken.length - 1) = (broken.last ^ 0x5a).toByte
    assert(Multimodal.decodePng(broken).isEmpty)
    // foreign payloads fall through
    assert(Multimodal.decodePng("not a png at all".getBytes).isEmpty)
  }

  test("asMixedMedia routes all three formats through the sniffing codec") {
    import graft.operators.Multimodal
    import spark.implicits._
    val docs = Seq((3L, "x" * 100), (4L, "x" * 100), (5L, "x" * 100))
      .toDF("doc_id", "text")
    val out = Multimodal.decode(Multimodal.asMixedMedia(docs, "doc_id", "text"))
      .collect().map(d => d.media_id -> d).toMap
    // same text, BMP (id 3) vs PNG (id 4): identical decoded records
    assert(out(3L).width == out(4L).width && out(3L).height == out(4L).height)
    assert(out(3L).content_hash == out(4L).content_hash)
    // JPEG (id 5): block-expanded geometry — 25 blocks across, 8 px
    // per block, ceil(100/25) = 4 block-rows
    assert(out(5L).width == 200 && out(5L).height == 32)
    def roll(bytes: Seq[Int]): Long =
      bytes.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    val scan = Seq.fill(25)(Seq.fill(8)('x'.toInt)).flatten
    val expected = roll(Seq.fill(4)(Seq.fill(8)(scan).flatten).flatten)
    assert(out(5L).content_hash == expected)
    val mimes = Multimodal.asMixedMedia(docs, "doc_id", "text")
      .select("media_id", "mime").as[(Long, String)].collect().toMap
    assert(mimes(3L) == "image/bmp" && mimes(4L) == "image/png" &&
      mimes(5L) == "image/jpeg")
  }

  test("JPEG codec round-trips: constant 8x8 blocks decode bit-exactly") {
    import graft.operators.Multimodal
    val bytes = Array.tabulate(10)(i => (i * 29 + 3).toByte)
    val jpeg = Multimodal.encodeJpegBlocks(bytes, blocksPerRow = 4)
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    val Some((w, h, px)) = Multimodal.decodeJpeg(jpeg)
    assert(w == 32 && h == 24) // 4 blocks across, ceil(10/4)=3 block-rows
    for (y <- 0 until h; x <- 0 until w) {
      val idx = (y / 8) * 4 + (x / 8)
      val want = if (idx < bytes.length) bytes(idx) & 0xff else 0
      assert((px(y * w + x) & 0xff) == want, s"pixel ($x,$y)")
    }
    // rejection: foreign payloads and progressive frames fall through
    assert(Multimodal.decodeJpeg("not a jpeg".getBytes).isEmpty)
    val progressive = jpeg.clone()
    // find the SOF0 marker and rewrite it to SOF2 (progressive)
    val sof = (2 until progressive.length - 1).find(i =>
      (progressive(i) & 0xff) == 0xff && (progressive(i + 1) & 0xff) == 0xc0).get
    progressive(sof + 1) = 0xc2.toByte
    assert(Multimodal.decodeJpeg(progressive).isEmpty)
  }

  test("JPEG restart markers: DRI/RSTn files round-trip and re-sync the DC predictor") {
    import graft.operators.Multimodal
    val bytes = Array.tabulate(37)(i => (i * 13 + 7).toByte)
    // interval 5 over 40 MCUs (4 block-rows of 10): 7 restart markers,
    // boundaries cross block-row edges
    val jpeg = Multimodal.encodeJpegBlocks(bytes, blocksPerRow = 10, restartInterval = 5)
    val Some((w, h, px)) = Multimodal.decodeJpeg(jpeg)
    assert(w == 80 && h == 32)
    for (y <- 0 until h; x <- 0 until w) {
      val idx = (y / 8) * 10 + (x / 8)
      val want = if (idx < bytes.length) bytes(idx) & 0xff else 0
      assert((px(y * w + x) & 0xff) == want, s"pixel ($x,$y)")
    }
    // the JDK's reader agrees on the restart-marker file too
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) == (px(y * w + x) & 0xff))
    // a corrupted restart marker (wrong index) is rejected, not misread
    val rstAt = (2 until jpeg.length - 1).indexWhere(i =>
      (jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) >= 0xd0 &&
        (jpeg(i + 1) & 0xff) <= 0xd7) + 2
    val bad = jpeg.clone()
    bad(rstAt + 1) = (0xd0 + (((bad(rstAt + 1) & 0x07) + 3) % 8)).toByte
    assert(Multimodal.decodeJpeg(bad).isEmpty)
  }

  test("JPEG encoder emits spec-valid files (JDK ImageIO reads them identically)") {
    import graft.operators.Multimodal
    val bytes = Array.tabulate(60)(i => (i * 7 + 1).toByte)
    val jpeg = Multimodal.encodeJpegBlocks(bytes, blocksPerRow = 8)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(img != null, "ImageIO could not parse the encoded JPEG")
    val Some((w, h, px)) = Multimodal.decodeJpeg(jpeg)
    assert(img.getWidth == w && img.getHeight == h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, 0) == (px(y * w + x) & 0xff), s"pixel ($x,$y)")
  }

  test("JPEG color: ImageIO-written YCbCr photo (subsampled chroma) decodes to RGB") {
    import graft.operators.Multimodal
    // a smooth color gradient: the JDK writer emits 3-component YCbCr
    // (with chroma subsampling), exercising the interleaved-MCU path,
    // per-component DC predictors, upsampling, and the JFIF conversion
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 4) << 16) | ((y * 5) << 8) | ((x + y) * 2))
    val out = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val jpeg = out.toByteArray
    val decoded = Multimodal.decodeJpeg(jpeg)
    assert(decoded.isDefined, "decoder rejected an ImageIO color JPEG")
    val Some((dw, dh, px)) = decoded
    assert(dw == w && dh == h && px.length == w * h * 3)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    // libjpeg upsamples chroma with its triangular filter; ours
    // replicates — identical on flat regions, small differences along
    // gradients. Require near-agreement everywhere plus exactness of
    // the luma-dominated mean.
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w; ch <- 0 until 3) {
      val rgb = ref.getRGB(x, y)
      val want = ch match {
        case 0 => (rgb >> 16) & 0xff
        case 1 => (rgb >> 8) & 0xff
        case 2 => rgb & 0xff
      }
      val got = px((y * w + x) * 3 + ch) & 0xff
      val d = math.abs(got - want)
      maxDiff = math.max(maxDiff, d); sumDiff += d
    }
    assert(maxDiff <= 8, s"decoders disagree by $maxDiff")
    assert(sumDiff.toDouble / (w * h * 3) <= 1.0,
      s"mean abs diff ${sumDiff.toDouble / (w * h * 3)}")
  }

  test("JPEG color fixture: constant YCbCr blocks decode to the arithmetic RGB, JDK-agreed") {
    import graft.operators.Multimodal
    val bytes = Array.tabulate(30)(i => (i * 17 + 5).toByte)
    val jpeg = Multimodal.encodeJpegColorBlocks(bytes, blocksPerRow = 6)
    val Some((w, h, px)) = Multimodal.decodeJpeg(jpeg)
    assert(w == 48 && h == 40 && px.length == w * h * 3) // ceil(30/6)=5 block-rows
    def rgb(b: Int): (Int, Int, Int) = {
      val y = b.toDouble
      val cb = ((7 * b + 13) % 256) - 128.0
      val cr = ((31 * b + 29) % 256) - 128.0
      def cl(v: Long) = math.max(0L, math.min(255L, v)).toInt
      (cl(math.round(y + 1.402 * cr)),
        cl(math.round(y - 0.344136 * cb - 0.714136 * cr)),
        cl(math.round(y + 1.772 * cb)))
    }
    for (y <- 0 until h; x <- 0 until w) {
      val idx = (y / 8) * 6 + (x / 8)
      val b = if (idx < bytes.length) bytes(idx) & 0xff else 0
      val (er, eg, eb) = rgb(b)
      val o = (y * w + x) * 3
      assert((px(o) & 0xff) == er && (px(o + 1) & 0xff) == eg &&
        (px(o + 2) & 0xff) == eb, s"pixel ($x,$y) byte $b")
    }
    // the JDK reader agrees within its fixed-point conversion's LSB
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val v = img.getRGB(x, y)
      val o = (y * w + x) * 3
      maxDiff = math.max(maxDiff, math.abs(((v >> 16) & 0xff) - (px(o) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs(((v >> 8) & 0xff) - (px(o + 1) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs((v & 0xff) - (px(o + 2) & 0xff)))
    }
    assert(maxDiff <= 1, s"JDK color conversion disagrees by $maxDiff")
  }

  test("JPEG decoder handles AC coefficients: ImageIO-written photo decodes within rounding") {
    import graft.operators.Multimodal
    // a non-constant grayscale image: ImageIO's encoder quantizes real
    // AC coefficients, exercising the run-length/ZRL/receive-extend and
    // full IDCT paths the DC-only fixture never touches
    val w = 48; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 53 + y * 31 + (x * y) % 17) % 256)
    val out = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val jpeg = out.toByteArray
    val decoded = Multimodal.decodeJpeg(jpeg)
    assert(decoded.isDefined, "decoder rejected an ImageIO baseline JPEG")
    val Some((dw, dh, px)) = decoded
    assert(dw == w && dh == h)
    // reference decode: the JDK's own (libjpeg-based) reader; IDCT
    // implementations may legitimately differ by ±1/LSB
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(ref.getRaster.getSample(x, y, 0) - (px(y * w + x) & 0xff)))
    assert(maxDiff <= 1, s"decoders disagree by $maxDiff")
  }

  test("progressive JPEG fixture decodes bit-identically to its baseline twin") {
    import graft.operators.Multimodal
    val bytes = Array.tabulate(60)(i => (i * 37 + 11).toByte)
    val prog = Multimodal.encodeJpegBlocksProgressive(bytes, blocksPerRow = 10)
    // really progressive: SOF2 present, SOF0 absent
    def hasMarker(a: Array[Byte], m: Int) =
      a.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(hasMarker(prog, 0xc2) && !hasMarker(prog, 0xc0))
    val base = Multimodal.encodeJpegBlocks(bytes, blocksPerRow = 10)
    val Some((pw, ph, ppx)) = Multimodal.decodeJpeg(prog)
    val Some((bw, bh, bpx)) = Multimodal.decodeJpeg(base)
    assert(pw == bw && ph == bh)
    assert(ppx.toSeq == bpx.toSeq, "progressive and baseline decodes differ")
    // and the JDK reader agrees with both
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(prog))
    assert(img != null && img.getWidth == pw && img.getHeight == ph)
    var maxDiff = 0
    for (y <- 0 until ph; x <- 0 until pw)
      maxDiff = math.max(maxDiff,
        math.abs(img.getRaster.getSample(x, y, 0) - (ppx(y * pw + x) & 0xff)))
    assert(maxDiff == 0, s"JDK disagrees by $maxDiff")
  }

  test("progressive JPEG: ImageIO-written grayscale photo (spectral selection + successive approximation)") {
    import graft.operators.Multimodal
    // textured gradient → the JDK's standard progressive script emits
    // spectral-selection AC bands with successive approximation and
    // refinement scans — the full Annex G surface
    val w = 72; val h = 56
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 3 + y * 2 + ((x * y) % 23) * 5) % 256
      img.getRaster.setSample(x, y, 0, v)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose(); ios.close()
    val jpeg = baos.toByteArray
    def hasMarker(a: Array[Byte], m: Int) =
      a.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(hasMarker(jpeg, 0xc2), "JDK did not write progressive")
    val decoded = Multimodal.decodeJpeg(jpeg)
    assert(decoded.isDefined, "decoder rejected a JDK progressive JPEG")
    val Some((dw, dh, px)) = decoded
    assert(dw == w && dh == h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(ref.getRaster.getSample(x, y, 0) - (px(y * w + x) & 0xff)))
    assert(maxDiff <= 1, s"decoders disagree by $maxDiff")
  }

  test("progressive JPEG: ImageIO-written color photo decodes through the same finish") {
    import graft.operators.Multimodal
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 4) << 16) | ((y * 5) << 8) | ((x + y) * 2))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose(); ios.close()
    val jpeg = baos.toByteArray
    val decoded = Multimodal.decodeJpeg(jpeg)
    assert(decoded.isDefined, "decoder rejected a JDK progressive color JPEG")
    val Some((dw, dh, px)) = decoded
    assert(dw == w && dh == h && px.length == w * h * 3)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w; ch <- 0 until 3) {
      val rgb = ref.getRGB(x, y)
      val want = ch match {
        case 0 => (rgb >> 16) & 0xff
        case 1 => (rgb >> 8) & 0xff
        case 2 => rgb & 0xff
      }
      val d = math.abs((px((y * w + x) * 3 + ch) & 0xff) - want)
      maxDiff = math.max(maxDiff, d); sumDiff += d
    }
    // same envelope as the baseline color photo test: replication vs
    // triangular chroma upsampling differs along gradients
    assert(maxDiff <= 8, s"decoders disagree by $maxDiff")
    assert(sumDiff.toDouble / (w * h * 3) <= 1.0,
      s"mean abs diff ${sumDiff.toDouble / (w * h * 3)}")
  }

  test("AVI/MJPEG codec round-trips: container walk, frame decode, stride sampling") {
    import graft.operators.Multimodal
    val texts = Seq("first frame bytes go here", "second one", "third frame!")
    val frames = texts.map(t => Multimodal.encodeJpegBlocks(t.getBytes("US-ASCII"), 25))
    val avi = Multimodal.encodeAviMjpeg(frames, 200, 8)
    val v = Multimodal.decodeAvi(avi).getOrElse(fail("decodeAvi rejected own fixture"))
    assert(v.width == 200 && v.height == 8)
    assert(v.microSecPerFrame == Multimodal.AviMicroSecPerFrame)
    assert(v.totalFrames == 3 && v.frames.length == 3)
    assert(v.frames.map(_._1) == Vector(0, 1, 2))
    // each container frame decodes exactly as the standalone JPEG does
    texts.zip(v.frames).foreach { case (t, (_, fw, fh, px)) =>
      val Some((jw, jh, jpx)) = Multimodal.decodeJpeg(
        Multimodal.encodeJpegBlocks(t.getBytes("US-ASCII"), 25))
      assert(fw == jw && fh == jh && px.toSeq == jpx.toSeq)
    }
    // rejects: not RIFF/AVI, truncated mid-chunk, corrupt frame bytes
    assert(Multimodal.decodeAvi("nope".getBytes).isEmpty)
    assert(Multimodal.decodeAvi(avi.take(avi.length - 5)).isEmpty)
    val corrupt = avi.clone()
    val frameAt = avi.indexOfSlice(Array(0xff.toByte, 0xd8.toByte))
    corrupt(frameAt) = 0 // first frame no longer a JPEG
    assert(Multimodal.decodeAvi(corrupt).isEmpty)
    // a WAV is not an AVI and vice versa
    assert(Multimodal.decodeAvi(
      Multimodal.encodeWavStereo("hello!".getBytes("US-ASCII"))).isEmpty)
    assert(Multimodal.decodeWav(avi).isEmpty)
  }

  test("decodeVideoFrames samples every stride-th frame with per-frame hashes") {
    import spark.implicits._
    import graft.operators.Multimodal
    // 80 chars → 4 frames of 25 (last padded); stride 2 keeps 0 and 2
    val text = "x" * 80
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val media = Multimodal.asAviMedia(docs, "doc_id", "text")
    val rows = Multimodal.decodeVideoFrames(media, stride = 2)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(rows.forall(_.getInt(2) == 4)) // n_frames sees the full count
    assert(rows.forall(r => r.getInt(4) == 200 && r.getInt(5) == 8))
    // frame hashes equal the standalone decode hash of the same slice
    def sliceHash(from: Int, until: Int): Long = {
      val Some((_, _, px)) = Multimodal.decodeJpeg(Multimodal.encodeJpegBlocks(
        text.getBytes("US-ASCII").slice(from, until), 25))
      px.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    }
    assert(rows(0).getLong(6) == sliceHash(0, 25))
    assert(rows(1).getLong(6) == sliceHash(50, 75))
    // stride 1 keeps all four
    assert(Multimodal.decodeVideoFrames(media, stride = 1).count() == 4)
  }

  test("sniffDecode routes AVI payloads to honest video metadata") {
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Seq((1L, "a video fixture with enough text for two frames!!")).toDF("doc_id", "text")
    val media = Multimodal.asAviMedia(docs, "doc_id", "text")
    val d = Multimodal.decode(media).collect().head
    assert(d.width == 200 && d.height == 8 && d.n_frames == 2)
    // content hash folds the concatenated decoded frame pixels
    val payload = media.select("payload").head().getAs[Array[Byte]](0)
    val v = Multimodal.decodeAvi(payload).get
    val h = v.frames.foldLeft(0L) { case (acc, (_, _, _, px)) =>
      px.foldLeft(acc)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    }
    assert(d.content_hash == h)
  }

  test("WAV codec agrees with the JDK javax.sound reference on format and PCM content") {
    val wav = Multimodal.encodeWavStereo("hello world graft".getBytes("US-ASCII"))
    // our parser
    val ours = Multimodal.decodeWav(wav).getOrElse(fail("decodeWav rejected own fixture"))
    // JDK reference
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getSampleRate.toInt == ours.sampleRate)
    assert(fmt.getChannels == ours.channels)
    assert(fmt.getSampleSizeInBits == 16)
    assert(in.getFrameLength == ours.frames)
    // recompute our stats from the JDK's decoded PCM bytes
    val pcm = in.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val peak = new Array[Long](2)
    val sumsq = new Array[Long](2)
    var s = 0
    while (s < pcm.length / 2) {
      val v = bb.getShort(s * 2).toLong
      val ch = s % 2
      peak(ch) = math.max(peak(ch), math.abs(v))
      sumsq(ch) += v * v
      s += 1
    }
    assert(peak.toSeq == ours.peak.toSeq && sumsq.toSeq == ours.sumsq.toSeq)
    // and the closed-form the oracle uses: sample i = (byte_i - 96) * 256
    val text = "hello world graft".getBytes("US-ASCII")
    val expect = (0 until (text.length / 2) * 2).map(i => ((text(i) & 0xff) - 96) * 256L)
    assert(ours.peak(0) == expect.zipWithIndex.filter(_._2 % 2 == 0).map(x => math.abs(x._1)).max)
    assert(ours.durationUs == ours.frames * 1000000L / 8000)
  }

  test("WAV parser: mono path, junk-chunk skipping, odd-size pad rule, rejects non-WAV") {
    // hand-build a MONO wav with an ODD-sized junk chunk before fmt
    def monoWav(samples: Array[Short], rate: Int): Array[Byte] = {
      val junk = Array[Byte](1, 2, 3) // odd — exercises the pad rule
      val dataSize = samples.length * 2
      val riffSize = 4 + (8 + junk.length + 1) + (8 + 16) + (8 + dataSize)
      val out = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize).put("WAVE".getBytes("US-ASCII"))
      out.put("junk".getBytes("US-ASCII")).putInt(junk.length).put(junk).put(0.toByte)
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      out.put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(out.putShort)
      out.array()
    }
    val w = Multimodal.decodeWav(monoWav(Array[Short](100, -300, 200), 16000))
      .getOrElse(fail("mono wav rejected"))
    assert(w.channels == 1 && w.sampleRate == 16000 && w.frames == 3)
    assert(w.peak.toSeq == Seq(300L))
    assert(w.sumsq.toSeq == Seq(100L * 100 + 300L * 300 + 200L * 200))
    assert(w.durationUs == 3L * 1000000 / 16000)
    // rejects: not RIFF, truncated data, float format
    assert(Multimodal.decodeWav("nope".getBytes).isEmpty)
    val good = monoWav(Array[Short](1, 2), 8000)
    assert(Multimodal.decodeWav(good.take(good.length - 1)).isEmpty)
    val floatFmt = good.clone()
    floatFmt(good.indexOfSlice("fmt ".getBytes("US-ASCII")) + 8) = 3 // IEEE float tag
    assert(Multimodal.decodeWav(floatFmt).isEmpty)
  }

  test("sniffDecode routes WAV payloads to honest audio metadata (mixed-corpus arm)") {
    import spark.implicits._
    val docs = Seq((1L, "stereo audio fixture")).toDF("doc_id", "text")
    val media = Multimodal.asWavMedia(docs, "doc_id", "text")
    val d = Multimodal.decode(media).collect().head
    val wav = Multimodal.encodeWavStereo("stereo audio fixture".getBytes("US-ASCII"))
    val ref = Multimodal.decodeWav(wav).get
    assert(d.width == 2)                         // channels
    assert(d.height == Multimodal.WavSampleRate / 100)
    assert(d.n_frames == ref.frames)
    assert(d.content_hash == ref.dataHash)       // hash over PCM bytes, not container
  }

  test("goertzel: integer bins detect their own tone; samples round-trip the encoder") {
    import spark.implicits._
    // decodeWavSamples inverts encodeWavStereo exactly
    val text = "spectral fixture text 123"
    val wav = Multimodal.encodeWavStereo(text.getBytes("US-ASCII"))
    val (rate, ch, samples) = Multimodal.decodeWavSamples(wav).get
    assert(rate == Multimodal.WavSampleRate && ch == 2)
    val bytes = text.getBytes("US-ASCII")
    assert(samples.length == 2 * (bytes.length / 2))
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(s == ((bytes(i) - 96) * 256).toShort)
    }
    // a pure Fs/4 tone (period 4: A, 0, -A, 0) lands in the c=0 bin
    // and is rejected by the others over whole periods
    val tone4 = Array.tabulate(200)(i => (Seq(1000, 0, -1000, 0)(i % 4)).toShort)
    val p4 = Multimodal.goertzelPower(tone4, 0, 200, 0L)
    val p6 = Multimodal.goertzelPower(tone4, 0, 200, 1L)
    val p3 = Multimodal.goertzelPower(tone4, 0, 200, -1L)
    assert(p4 > 100L * p6 && p4 > 100L * p3, s"$p4 $p6 $p3")
    // a pure Fs/6 tone (period 6) lands in the c=1 bin
    val tone6 = Array.tabulate(198)(i =>
      (Seq(0, 866, 866, 0, -866, -866)(i % 6)).toShort)
    val q6 = Multimodal.goertzelPower(tone6, 0, 198, 1L)
    val q4 = Multimodal.goertzelPower(tone6, 0, 198, 0L)
    assert(q6 > 100L * math.max(q4, 1L), s"$q6 $q4")
    // powers are |X(k)|^2 in Z[w]: never negative, even on noise
    val noise = Array.tabulate(137)(i => ((i * 2654435761L % 20000) - 10000).toShort)
    Seq(-1L, 0L, 1L).foreach(c =>
      assert(Multimodal.goertzelPower(noise, 0, noise.length, c) >= 0L))
    // the Dataset op: per media x channel rows, windows counted, and
    // partition invariance
    val docs = Seq((1L, "abcd efgh"), (2L, "x")).toDF("doc_id", "text")
    val media = Multimodal.asWavMedia(docs, "doc_id", "text")
    val rows = Multimodal.audioGoertzel(media, windowSize = 4).collect()
      .map(r => (r.media_id, r.channel) -> ((r.n_windows, r.e_fs6, r.e_fs4, r.e_fs3)))
      .toMap
    assert(rows.size == 4)
    // doc 1: 9 chars -> 8 samples -> 4 per channel -> 1 window of 4
    assert(rows((1L, 0))._1 == 1L)
    // doc 2: 1 char -> 0 whole frames -> 0 windows, zero energies
    assert(rows((2L, 0)) == ((0L, 0L, 0L, 0L)))
    val again = Multimodal.audioGoertzel(media.repartition(5), windowSize = 4)
      .collect().map(r => (r.media_id, r.channel) ->
        ((r.n_windows, r.e_fs6, r.e_fs4, r.e_fs3))).toMap
    assert(again == rows)
  }

  test("phash: re-encode invariance, discrimination, and blocked ≡ brute-force pairs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf("sf0.001")).limit(60)
    val media = Multimodal.asRencodedMedia(docs, "doc_id", "text")
    val hashed = Multimodal.phash(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("phash")).toMap
    assert(hashed.size == 180) // every variant decodes to a hash
    val docIds = docs.select("doc_id").as[Long].collect()
    docIds.foreach { d =>
      // BMP and PNG carry byte-identical pixels -> identical hash
      assert(hashed(d * 4) == hashed(d * 4 + 1),
        s"container swap changed the perceptual hash for doc $d")
      // the perturbed variant stays NEAR (pHash moves few bits for
      // low-order luma flips) but the fixture guarantees no exact rule;
      // just pin that perturbation never flips a majority of bits
      val ham = java.lang.Long.bitCount(hashed(d * 4) ^ hashed(d * 4 + 2))
      assert(ham <= 32, s"perturbed near-dup at implausible hamming $ham")
    }
    // discrimination: not all hashes collapse to one value
    assert(hashed.values.toSet.size > 20)
    // blocked pair scan == brute-force Hamming ball (recall-complete
    // pigeonhole + explicit precision filter)
    val maxH = 3
    val blocked = graft.operators.Dedup.hammingPairs(
      Multimodal.phash(media).select(col("media_id").as("doc"), col("phash").as("h")),
      maxHamming = maxH)
      .collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Long]("hamming")))
      .toSet
    val ids = hashed.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(hashed(ids(i)) ^ hashed(ids(j)))
      if h <= maxH
    } yield (ids(i), ids(j), h.toLong)).toSet
    assert(blocked == brute)
  }

  test("phash64 is invariant to where pixels came from, sensitive to content") {
    val text = "the quick brown fox jumps over the lazy dog " * 8
    val bmp = Multimodal.decodeBmp(
      Multimodal.encodeBmp24(text.getBytes("UTF-8"), Multimodal.BmpMediaWidth)).get
    val png = Multimodal.decodePng(
      Multimodal.encodePng(text.getBytes("UTF-8"), Multimodal.BmpMediaWidth)).get
    assert(bmp._3.toSeq == png._3.toSeq)
    val h1 = Multimodal.phash64(bmp._3, bmp._1, bmp._2)
    val h2 = Multimodal.phash64(png._3, png._1, png._2)
    assert(h1 == h2)
    val other = Multimodal.decodeBmp(
      Multimodal.encodeBmp24(("zzz completely different content 0123456789 " * 8)
        .getBytes("UTF-8"), Multimodal.BmpMediaWidth)).get
    val h3 = Multimodal.phash64(other._3, other._1, other._2)
    assert(java.lang.Long.bitCount(h1 ^ h3) > 3,
      "distinct content should not sit inside the near-dup ball")
  }

  test("AVI container re-encode (JUNK chunk) parses to identical frames, different bytes") {
    val text = "the quick brown fox jumps over the lazy dog padding " * 2
    val frames = (0 until 3).map { f =>
      Multimodal.encodeJpegBlocks(
        text.getBytes("UTF-8").slice(f * 25, f * 25 + 25), 25)
    }
    val plain = Multimodal.encodeAviMjpeg(frames, 200, 8)
    val junked = Multimodal.encodeAviMjpeg(frames, 200, 8, withJunk = true)
    assert(!java.util.Arrays.equals(plain, junked))
    val a = Multimodal.decodeAvi(plain).get
    val b = Multimodal.decodeAvi(junked).get
    assert(a.totalFrames == b.totalFrames && a.width == b.width)
    assert(a.frames.map(_._1) == b.frames.map(_._1))
    (a.frames zip b.frames).foreach { case ((_, _, _, pa), (_, _, _, pb)) =>
      assert(java.util.Arrays.equals(pa, pb))
    }
  }

  test("asRencodedVideoMedia: v1 frame-identical to v0, v2 exactly one frame shorter") {
    import spark.implicits._
    val docs = Seq((7L, "x" * 80)).toDF("doc_id", "text") // 4 frames of 25
    val rows = Multimodal.decodeVideoFrames(
      Multimodal.asRencodedVideoMedia(docs, "doc_id", "text"), stride = 1)
      .collect().groupBy(_.getAs[Long]("media_id"))
    def hashes(m: Long) = rows(m).sortBy(_.getAs[Int]("frame_idx"))
      .map(r => (r.getAs[Int]("frame_idx"), r.getAs[Long]("frame_hash"))).toSeq
    assert(hashes(28L) == hashes(29L)) // 7*4+0 vs 7*4+1: container swap only
    assert(hashes(30L) == hashes(28L).dropRight(1)) // trimmed: last frame cut
  }

  test("WAV container re-encode (extra JUNK) keeps PCM identical; audioFingerprints fold is exact") {
    val text = "abcdefghij" * 30 // 300 bytes -> 150 samples/channel
    val plain = Multimodal.encodeWavStereo(text.getBytes("US-ASCII"))
    val junked = Multimodal.encodeWavStereo(text.getBytes("US-ASCII"), extraJunk = true)
    assert(!java.util.Arrays.equals(plain, junked))
    val (r1, c1, s1) = Multimodal.decodeWavSamples(plain).get
    val (r2, c2, s2) = Multimodal.decodeWavSamples(junked).get
    assert(r1 == r2 && c1 == c2 && s1.toSeq == s2.toSeq)
    // direct replay of the channel-seeded window fold (window 1, channel 0)
    import spark.implicits._
    val media = Seq((1L, plain, "audio/wav")).toDF("media_id", "payload", "mime")
    val fp = Multimodal.audioFingerprints(media, windowSize = 50).collect()
      .map(r => (r.getAs[Long]("channel"), r.getAs[Long]("window_idx")) ->
        r.getAs[Long]("whash")).toMap
    assert(fp.size == 6) // 150 samples/channel -> 3 windows x 2 channels
    var h = 1L
    (50 until 100).foreach { j =>
      h = (h * 31 + (s1(j * 2) + 32768)) % 1000000007L
    }
    assert(fp((0L, 1L)) == h)
  }

  test("asRencodedAudioMedia: v2 drops exactly each channel's last window") {
    import spark.implicits._
    val docs = Seq((3L, "q" * 300)).toDF("doc_id", "text") // 150 samples/ch, 3 windows
    val fp = Multimodal.audioFingerprints(
      Multimodal.asRencodedAudioMedia(docs, "doc_id", "text", windowSize = 50),
      windowSize = 50).collect()
      .groupBy(_.getAs[Long]("media_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("channel"),
        r.getAs[Long]("window_idx"), r.getAs[Long]("whash"))).toSet).toMap
    assert(fp(12L) == fp(13L)) // container swap: identical fingerprints
    assert(fp(14L) == fp(12L).filter(_._2 < 2)) // trimmed: last window gone
  }
}
