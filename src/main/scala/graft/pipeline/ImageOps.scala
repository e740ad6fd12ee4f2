package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** In-memory image record mirroring Spark's image-source struct and the
  * reference's row layout (reference: src/piper/spark/data_augment.py:42-60):
  * row-major H x W x C uint8 bytes, BGR channel order (OpenCV convention,
  * preserved per SURVEY.md §7 "non-standard reference semantics").
  */
case class ImageRecord(origin: String, height: Int, width: Int,
    nChannels: Int, mode: Int, data: Array[Byte])

/** Pure scalar image ops (reference rows A8-A22 in SURVEY.md §2-A),
  * deterministic under fixed seeds. These run inside Dataset.map /
  * mapPartitions on executors — each op is O(pixels) with no allocation
  * beyond the output buffer, so throughput scales with partition count.
  */
object ImageOps {

  // in-memory streams only — never the per-image temp-file cache
  ImageIoTuning.ensure()

  @inline private def clampByte(v: Double): Byte =
    math.max(0, math.min(255, math.round(v))).toByte

  @inline private def u(b: Byte): Int = b & 0xff

  /** A8: bytes -> validated H x W x C image. Fast path: buffer length
    * matches the declared shape (reshape-only, as the reference does for
    * 3-channel); fallback: decode an encoded image (jpg/png/bmp/gif) via
    * ImageIO into BGR bytes. Returns None for undecodable input
    * (dropInvalid semantics, A7). */
  def decode(rec: ImageRecord): Option[ImageRecord] = {
    if (rec.data == null || rec.data.isEmpty) return None // empty-buffer guard
    if (rec.data.length == rec.height * rec.width * rec.nChannels) Some(rec)
    else decodeEncoded(rec.origin, rec.data)
  }

  /** Decode an encoded (jpeg/png/bmp/gif) byte stream to a BGR record. */
  def decodeEncoded(origin: String, bytes: Array[Byte]): Option[ImageRecord] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val h = img.getHeight
        val w = img.getWidth
        val out = new Array[Byte](h * w * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val i = (y * w + x) * 3
            out(i) = (rgb & 0xff).toByte             // B
            out(i + 1) = ((rgb >> 8) & 0xff).toByte  // G
            out(i + 2) = ((rgb >> 16) & 0xff).toByte // R
            x += 1
          }
          y += 1
        }
        Some(ImageRecord(origin, h, w, 3, 16, out))
      }
    } catch { case _: Throwable => None }

  /** A9: area-interpolation resize (cv2.INTER_AREA analog): each output
    * pixel averages the exact (fractionally weighted) source area it
    * covers — correct for downscale; degenerates to bilinear-ish smoothing
    * on upscale, matching INTER_AREA's behavior. */
  def resizeArea(rec: ImageRecord, tw: Int, th: Int): ImageRecord = {
    val (h, w, c) = (rec.height, rec.width, rec.nChannels)
    val out = new Array[Byte](th * tw * c)
    val sy = h.toDouble / th
    val sx = w.toDouble / tw
    var oy = 0
    while (oy < th) {
      val y0 = oy * sy; val y1 = (oy + 1) * sy
      var ox = 0
      while (ox < tw) {
        val x0 = ox * sx; val x1 = (ox + 1) * sx
        var ch = 0
        while (ch < c) {
          var acc = 0.0; var area = 0.0
          var yy = math.floor(y0).toInt
          while (yy < math.min(math.ceil(y1), h)) {
            val wy = math.min(y1, yy + 1) - math.max(y0, yy)
            var xx = math.floor(x0).toInt
            while (xx < math.min(math.ceil(x1), w)) {
              val wx = math.min(x1, xx + 1) - math.max(x0, xx)
              acc += u(rec.data((yy * w + xx) * c + ch)) * wy * wx
              area += wy * wx
              xx += 1
            }
            yy += 1
          }
          out((oy * tw + ox) * c + ch) = clampByte(acc / area)
          ch += 1
        }
        ox += 1
      }
      oy += 1
    }
    rec.copy(height = th, width = tw, data = out)
  }

  /** Per-record RNG seed: run seed + record origin through a splitmix64
    * finalizer. A plain `seed * GOLDEN ^ hash` is NOT enough: the origin
    * hash only perturbs the low 32 bits, and java.util.Random's first
    * draws come from the HIGH bits of its 48-bit state — neighboring
    * origins then share their first apply/skip decision corpus-wide
    * (observed: 16 origins, 16 near-identical first nextDouble ≈ 0.95).
    * The finalizer avalanches every input bit into every output bit. */
  private def perRecordSeed(seed: Long, origin: String): Long = {
    var z = seed * 0x9E3779B97F4A7C15L ^ origin.hashCode.toLong
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** A10: seeded random flip — horizontal, vertical, or both. The seed
    * is MIXED with the record's origin so a corpus-wide augmentation run
    * picks a different (but run-deterministic and retry-stable) flip per
    * image: seeding the RNG with the bare run seed would give every
    * record in the corpus the identical flip — zero augmentation
    * diversity (reference seeds 42 => deterministic per record). */
  def flipSeeded(rec: ImageRecord, seed: Long): ImageRecord =
    new scala.util.Random(perRecordSeed(seed, rec.origin))
      .nextInt(3) match {
      case 0 => flip(rec, horizontal = true, vertical = false)
      case 1 => flip(rec, horizontal = false, vertical = true)
      case _ => flip(rec, horizontal = true, vertical = true)
    }

  def flip(rec: ImageRecord, horizontal: Boolean, vertical: Boolean): ImageRecord = {
    val (h, w, c) = (rec.height, rec.width, rec.nChannels)
    val out = new Array[Byte](rec.data.length)
    var y = 0
    while (y < h) {
      val sy = if (vertical) h - 1 - y else y
      var x = 0
      while (x < w) {
        val sx = if (horizontal) w - 1 - x else x
        System.arraycopy(rec.data, (sy * w + sx) * c, out, (y * w + x) * c, c)
        x += 1
      }
      y += 1
    }
    rec.copy(data = out)
  }

  /** A11/A15: rotation about the image center by `degrees`, bilinear
    * sampling, black fill (reference: fixed 15 deg / random uniform). */
  def rotate(rec: ImageRecord, degrees: Double): ImageRecord = {
    val (h, w, c) = (rec.height, rec.width, rec.nChannels)
    val out = new Array[Byte](rec.data.length)
    val rad = math.toRadians(degrees)
    val cosA = math.cos(rad); val sinA = math.sin(rad)
    val cy = (h - 1) / 2.0; val cx = (w - 1) / 2.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // inverse mapping: dst -> src
        val dx = x - cx; val dy = y - cy
        val sxf = cosA * dx + sinA * dy + cx
        val syf = -sinA * dx + cosA * dy + cy
        if (sxf >= 0 && sxf <= w - 1 && syf >= 0 && syf <= h - 1) {
          val x0 = sxf.toInt; val y0 = syf.toInt
          val x1 = math.min(x0 + 1, w - 1); val y1 = math.min(y0 + 1, h - 1)
          val fx = sxf - x0; val fy = syf - y0
          var ch = 0
          while (ch < c) {
            val v00 = u(rec.data((y0 * w + x0) * c + ch))
            val v01 = u(rec.data((y0 * w + x1) * c + ch))
            val v10 = u(rec.data((y1 * w + x0) * c + ch))
            val v11 = u(rec.data((y1 * w + x1) * c + ch))
            val v = v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) +
              v10 * (1 - fx) * fy + v11 * fx * fy
            out((y * w + x) * c + ch) = clampByte(v)
            ch += 1
          }
        }
        x += 1
      }
      y += 1
    }
    rec.copy(data = out)
  }

  /** A12: linear color jitter v' = alpha*v + beta, saturating at [0,255]
    * (cv2.convertScaleAbs analog; reference alpha=1.2, beta=10). */
  def colorJitter(rec: ImageRecord, alpha: Double = 1.2,
      beta: Double = 10.0): ImageRecord = {
    val out = new Array[Byte](rec.data.length)
    var i = 0
    while (i < out.length) {
      out(i) = clampByte(alpha * u(rec.data(i)) + beta)
      i += 1
    }
    rec.copy(data = out)
  }

  /** A18: multiplicative contrast about midpoint 128 + additive
    * brightness, clamped (reference semantics preserved). */
  def contrastBrightness(rec: ImageRecord, contrast: Double,
      brightness: Double): ImageRecord = {
    val out = new Array[Byte](rec.data.length)
    var i = 0
    while (i < out.length) {
      out(i) = clampByte((u(rec.data(i)) - 128.0) * contrast + 128.0 + brightness)
      i += 1
    }
    rec.copy(data = out)
  }

  /** A16: with probability `prob`, add seeded gaussian noise (sigma on the
    * 0-255 scale; reference uses N(0, 0.01) on unit-scaled tensors).
    * The seed is origin-mixed like [[flipSeeded]]: a corpus-wide map with
    * one run seed draws an independent apply-decision and noise mask per
    * image — a bare-seed RNG would stamp the IDENTICAL mask on every
    * record (zero augmentation diversity). */
  def gaussianNoise(rec: ImageRecord, seed: Long, prob: Double = 0.5,
      sigma: Double = 2.55): ImageRecord = {
    val rng = new scala.util.Random(perRecordSeed(seed, rec.origin))
    if (rng.nextDouble() >= prob) rec
    else {
      val out = new Array[Byte](rec.data.length)
      var i = 0
      while (i < out.length) {
        out(i) = clampByte(u(rec.data(i)) + rng.nextGaussian() * sigma)
        i += 1
      }
      rec.copy(data = out)
    }
  }

  /** A17: random erasing (cutout): with probability `prob` blank a random
    * rectangle of 2-40% area, aspect in [0.3, 3.3], filled with the image
    * mean color or seeded random values. */
  def randomErase(rec: ImageRecord, seed: Long, prob: Double = 0.5,
      fillMean: Boolean = true): ImageRecord = {
    // origin-mixed seed, same rationale as gaussianNoise/flipSeeded:
    // per-record rectangles, not one corpus-wide rectangle
    val rng = new scala.util.Random(perRecordSeed(seed, rec.origin))
    if (rng.nextDouble() >= prob) return rec
    val (h, w, c) = (rec.height, rec.width, rec.nChannels)
    val area = h * w
    val targetArea = (0.02 + rng.nextDouble() * 0.38) * area
    val aspect = 0.3 + rng.nextDouble() * 3.0
    val eh = math.max(1, math.min(h, math.round(math.sqrt(targetArea * aspect)).toInt))
    val ew = math.max(1, math.min(w, math.round(math.sqrt(targetArea / aspect)).toInt))
    val y0 = if (h == eh) 0 else rng.nextInt(h - eh)
    val x0 = if (w == ew) 0 else rng.nextInt(w - ew)
    val fill = new Array[Byte](c)
    if (fillMean) {
      // per-record full-image aggregation for the mean color (A17 note)
      val sums = new Array[Long](c)
      var i = 0
      while (i < rec.data.length) { sums(i % c) += u(rec.data(i)); i += 1 }
      var ch = 0
      while (ch < c) { fill(ch) = clampByte(sums(ch).toDouble / (area)); ch += 1 }
    } else {
      var ch = 0
      while (ch < c) { fill(ch) = rng.nextInt(256).toByte; ch += 1 }
    }
    val out = rec.data.clone()
    var y = y0
    while (y < y0 + eh) {
      var x = x0
      while (x < x0 + ew) {
        System.arraycopy(fill, 0, out, (y * w + x) * c, c)
        x += 1
      }
      y += 1
    }
    rec.copy(data = out)
  }

  /** A13: JPEG encode at the given quality (reference: 95). Input BGR. */
  def jpegEncode(rec: ImageRecord, quality: Float = 0.95f): Array[Byte] = {
    val img = toBufferedImage(rec)
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), params)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  /** Lossless PNG encode (unlike [[jpegEncode]]): the 8-bit RGB
    * roundtrip through ImageIO is bit-exact, so a decode of the result
    * reproduces the input pixels — what the dHash fixtures rely on to
    * exercise the REAL decode path while the oracle replays the known
    * raw pixel formula. */
  def pngEncode(rec: ImageRecord): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(toBufferedImage(rec), "png", bos)
    bos.toByteArray
  }

  def toBufferedImage(rec: ImageRecord): BufferedImage = {
    val img = new BufferedImage(rec.width, rec.height,
      BufferedImage.TYPE_INT_RGB)
    val c = rec.nChannels
    var y = 0
    while (y < rec.height) {
      var x = 0
      while (x < rec.width) {
        val i = (y * rec.width + x) * c
        val (b, g, r) =
          if (c >= 3) (u(rec.data(i)), u(rec.data(i + 1)), u(rec.data(i + 2)))
          else { val v = u(rec.data(i)); (v, v, v) }
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** A20: HWC uint8 -> CHW float tensor scaled to [0,1]. */
  def toTensorCHW(rec: ImageRecord): Array[Float] = {
    val (h, w, c) = (rec.height, rec.width, rec.nChannels)
    val out = new Array[Float](h * w * c)
    var ch = 0
    while (ch < c) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(ch * h * w + y * w + x) = u(rec.data((y * w + x) * c + ch)) / 255.0f
          x += 1
        }
        y += 1
      }
      ch += 1
    }
    out
  }

  /** A22: per-channel (x - mean) / std on a CHW tensor (ImageNet
    * constants by default; reference normalize.rs:8-15). */
  val imagenetMean: Array[Float] = Array(0.485f, 0.456f, 0.406f)
  val imagenetStd: Array[Float] = Array(0.229f, 0.224f, 0.225f)

  def normalizeCHW(t: Array[Float], channels: Int,
      mean: Array[Float] = imagenetMean,
      std: Array[Float] = imagenetStd): Array[Float] = {
    val plane = t.length / channels
    val out = new Array[Float](t.length)
    var ch = 0
    while (ch < channels) {
      var i = 0
      while (i < plane) {
        out(ch * plane + i) = (t(ch * plane + i) - mean(ch)) / std(ch)
        i += 1
      }
      ch += 1
    }
    out
  }
}
