package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.metadata.IIOMetadataNode

/** REAL pure-JVM video-container frame sampling for animated GIF.
  *
  * GIF is the one timed multi-frame container the offline JDK can
  * actually demux and decode (LZW frames + per-frame Graphic Control
  * Extension delays), so it gets a real implementation while
  * mp4/webm/mkv stay behind the [[MediaCodec]] stub. The reference's
  * media surface is image-only (`reference/src/piper/spark/
  * data_augment.py:42-81`, formats `.jpg .jpeg .png .bmp .gif` in
  * `reference/src/piper/utils/constants.py:2`) — this closes the
  * self-imposed video-seam extension with the GIF member of that list.
  *
  * Decoding composites each frame onto the logical screen the way a
  * player would: frames carry (left, top) offsets and one of four
  * disposal methods; `restoreToBackgroundColor` clears the frame's
  * rect to transparent (the modern-player convention) and
  * `restoreToPrevious` rolls the canvas back after display. Sampling
  * walks the composed timeline at `everyMs` steps — sample k shows
  * the frame whose [start, start+delay) interval covers k·everyMs —
  * and re-encodes each sampled canvas as PNG bytes (lossless, so
  * tests can pin exact pixels). A delay of 0 cs renders as 100 ms,
  * the de-facto player convention for unset delays.
  *
  * Everything is per-clip, driver-free and deterministic: the decode
  * runs inside executor tasks via [[MediaCodec.Jvm]], one clip per
  * row, no shared state — retried tasks re-produce identical bytes.
  */
object GifFrames {

  // in-memory streams only — never the per-image temp-file cache
  ImageIoTuning.ensure()

  private def isGif(bytes: Array[Byte]): Boolean =
    bytes.length > 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** One composed frame: start of its display interval, its duration,
    * and the full logical-screen canvas while it is showing. */
  private final case class Composed(startMs: Long, durMs: Long,
      canvas: BufferedImage)

  private def attr(parent: IIOMetadataNode, tag: String,
      name: String): Option[String] = {
    val nodes = parent.getElementsByTagName(tag)
    if (nodes.getLength == 0) None
    else Option(nodes.item(0).asInstanceOf[IIOMetadataNode]
      .getAttribute(name)).filter(_.nonEmpty)
  }

  private def copyOf(img: BufferedImage): BufferedImage = {
    val c = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_INT_ARGB)
    val g = c.createGraphics()
    g.drawImage(img, 0, 0, null)
    g.dispose()
    c
  }

  /** Demux + decode + composite. None when the bytes are not a
    * decodable GIF (drop-undecodable policy upstream). */
  private def decode(bytes: Array[Byte]): Option[Vector[Composed]] = {
    if (!isGif(bytes)) return None
    val readers = ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return None
    val reader = readers.next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      if (n <= 0) return None
      // logical screen size from stream metadata; fall back to frame 0
      val streamRoot = reader.getStreamMetadata
        .getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[IIOMetadataNode]
      val first = reader.read(0)
      val w = attr(streamRoot, "LogicalScreenDescriptor",
        "logicalScreenWidth").map(_.toInt).getOrElse(first.getWidth)
      val h = attr(streamRoot, "LogicalScreenDescriptor",
        "logicalScreenHeight").map(_.toInt).getOrElse(first.getHeight)
      val canvas = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
      var ts = 0L
      val out = Vector.newBuilder[Composed]
      for (i <- 0 until n) {
        val frame = if (i == 0) first else reader.read(i)
        val meta = reader.getImageMetadata(i)
          .getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[IIOMetadataNode]
        val left = attr(meta, "ImageDescriptor", "imageLeftPosition")
          .map(_.toInt).getOrElse(0)
        val top = attr(meta, "ImageDescriptor", "imageTopPosition")
          .map(_.toInt).getOrElse(0)
        val delayCs = attr(meta, "GraphicControlExtension", "delayTime")
          .map(_.toInt).getOrElse(0)
        val disposal = attr(meta, "GraphicControlExtension",
          "disposalMethod").getOrElse("none")
        val durMs = if (delayCs <= 0) 100L else delayCs * 10L
        val saved =
          if (disposal == "restoreToPrevious") Some(copyOf(canvas)) else None
        val g = canvas.createGraphics()
        g.drawImage(frame, left, top, null)
        g.dispose()
        out += Composed(ts, durMs, copyOf(canvas))
        ts += durMs
        disposal match {
          case "restoreToBackgroundColor" =>
            val g2 = canvas.createGraphics()
            g2.setComposite(java.awt.AlphaComposite.Clear)
            g2.fillRect(left, top, frame.getWidth, frame.getHeight)
            g2.dispose()
          case "restoreToPrevious" =>
            val g2 = canvas.createGraphics()
            g2.setComposite(java.awt.AlphaComposite.Src)
            g2.drawImage(saved.get, 0, 0, null)
            g2.dispose()
          case _ => () // none / doNotDispose: canvas persists
        }
      }
      Some(out.result())
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Sample the composed timeline at 0, everyMs, 2·everyMs, … (up to
    * `maxFrames` samples, strictly inside the clip's total duration)
    * and return (tsMs, pngBytes) per sample. None = not a GIF. */
  def sample(bytes: Array[Byte], everyMs: Long,
      maxFrames: Int): Option[Seq[(Long, Array[Byte])]] =
    decode(bytes).map { frames =>
      val total = frames.last.startMs + frames.last.durMs
      val step = math.max(1L, everyMs)
      Iterator.from(0).map(_ * step)
        .takeWhile(t => t == 0L || t < total)
        .take(math.max(0, maxFrames))
        .map { t =>
          // last frame whose display interval starts at or before t
          // (intervals tile [0, total), so this is the covering frame)
          val f = frames.takeWhile(_.startMs <= t).last
          val baos = new ByteArrayOutputStream()
          ImageIO.write(f.canvas, "png", baos)
          (t, baos.toByteArray)
        }
        .toVector
    }
}
