package graft.pipeline

import java.io.ByteArrayOutputStream

/** Deterministic synthetic media clips for the driver-visible probe
  * query (q138) — the media twin of Pipeline.syntheticImage: real
  * container bytes (valid MPEG audio frames, RIFF/WAVE chunks, GIF
  * block structure, ISO-BMFF box trees, Ogg pages) generated purely
  * from the row id, so the probe exercises every parser family on
  * every run with bit-identical inputs. Payloads are id-seeded filler:
  * the CONTAINER layer is what q138 probes; sample data never decodes.
  */
object MediaFixtures {

  // in-memory streams only — never the per-image temp-file cache
  ImageIoTuning.ensure()

  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
    (v >> 8).toByte, v.toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)
  private def le64(v: Long) = le32(v & 0xffffffffL) ++ le32(v >>> 32)
  private def cc(s: String) = s.getBytes("ISO-8859-1")

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    parts.foreach(o.write)
    o.toByteArray
  }

  /** MPEG-1 Layer III CBR stream: 44.1 kHz / 128 kbps / stereo frames
    * (417 bytes each, no padding), `2 + id % 9` frames. Every third mp3
    * id (`(id/7) % 3` — mp3 ids step by the round-robin width) prepends
    * a Xing header frame, the next third a VBRI one (r11),
    * each declaring exactly the shipped frame/byte totals — so the
    * probed duration equals the tagless walk (no pinned q138 field
    * moves) while the driver-visible corpus exercises the declared-
    * totals code path, not just the fixture-only spec tests. */
  private def mp3(id: Long): Array[Byte] = {
    val n = 2 + (id % 9).toInt
    val audio = cat((0 until n).map { i =>
      val f = Array.fill[Byte](417)(((id * 31 + i) & 0x7f).toByte)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte; f(2) = 0x90.toByte; f(3) = 0
      f
    }: _*)
    def tagFrame(body: Array[Byte]): Array[Byte] = {
      val f = Array.fill[Byte](417)(0)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte; f(2) = 0x90.toByte; f(3) = 0
      System.arraycopy(body, 0, f, 36, body.length) // MPEG1-stereo offset
      f
    }
    (id / 7) % 3 match {
      case 1 => cat(tagFrame(cat(cc("Xing"), be32(3),
        be32(n), be32(n * 417L))), audio)
      case 2 => cat(tagFrame(cat(cc("VBRI"), be16(1), be16(0), be16(0),
        be32(n * 417L), be32(n))), audio)
      case _ => audio
    }
  }

  /** ADTS AAC-LC stream: 44.1 kHz stereo, `2 + id % 9` frames of one
    * 1024-sample block each over a 200-byte payload. Every third aac
    * id ships CRC-protected 9-byte headers, the next third packs TWO
    * raw data blocks per frame — so the driver-visible corpus walks
    * all three header shapes, not just the plain one. Payload bytes
    * stay ≤ 0x7f (no false 0xFFFx syncs inside frames). */
  private def aacAdts(id: Long): Array[Byte] = {
    val variant = ((id / 7) % 3).toInt
    val prot = if (variant == 1) 0 else 1 // 0 = CRC present
    val rdb = if (variant == 2) 1 else 0  // raw_data_blocks - 1
    val hdrLen = if (prot == 1) 7 else 9
    val n = 2 + (id % 9).toInt
    cat((0 until n).map { i =>
      val len = hdrLen + 200
      val h = Array[Byte](
        0xff.toByte, (0xf0 | prot).toByte, 0x50,
        (0x80 | ((len >> 11) & 3)).toByte, ((len >> 3) & 0xff).toByte,
        (((len & 7) << 5) | 0x1f).toByte, (0xfc | rdb).toByte)
      val crc = if (prot == 0) Array[Byte](0, 0) else Array.empty[Byte]
      cat(h, crc, Array.tabulate[Byte](200)(
        j => ((id * 17 + i + j) & 0x7f).toByte))
    }: _*)
  }

  /** 16-bit stereo PCM WAV, 16 kHz, `(1 + id % 5) / 4` seconds. */
  private def wav(id: Long): Array[Byte] = {
    val dataLen = 64000 / 4 * (1 + (id % 5).toInt)
    val fmt = cat(cc("fmt "), le32(16), le16(1), le16(2), le32(16000),
      le32(64000), le16(4), le16(16))
    val data = cat(cc("data"), le32(dataLen),
      Array.tabulate[Byte](dataLen)(i => ((id + i) & 0xff).toByte))
    cat(cc("RIFF"), le32(4L + fmt.length + data.length), cc("WAVE"),
      fmt, data)
  }

  /** AIFF / AIFF-C twin of [[wav]] on the same duration grid
    * (0.25·(1+id%5) s): 16 kHz stereo s16, 4000·(1+id%5) sample
    * frames, the rate carried as the format's 80-bit extended float.
    * Every second aiff id ships as AIFC with the 'sowt' (byte-swapped
    * pcm) compression fourcc, so the driver corpus walks both COMM
    * layouts. */
  private def aiff(id: Long): Array[Byte] = {
    val frames = 4000L * (1 + (id % 5).toInt)
    val sowt = (id / 7) % 2 == 0
    val rate = 16000
    val lg = 31 - Integer.numberOfLeadingZeros(rate)
    val m = rate.toLong << (63 - lg)
    val ext = cat(be16(16383 + lg), be32(m >>> 32), be32(m & 0xffffffffL))
    val commBody = cat(be16(2), be32(frames), be16(16), ext,
      if (sowt) cat(cc("sowt"), Array[Byte](0, 0)) // empty pstring + pad
      else Array.empty[Byte])
    val comm = cat(cc("COMM"), be32(commBody.length), commBody)
    val n = (frames * 4).toInt
    val ssnd = cat(cc("SSND"), be32(8L + n), be32(0), be32(0),
      Array.tabulate[Byte](n)(i => ((id + i) & 0x7f).toByte))
    val form = if (sowt) "AIFC" else "AIFF"
    cat(cc("FORM"), be32(4L + comm.length + ssnd.length), cc(form),
      comm, ssnd)
  }

  /** Sun AU: G.711 µ-law mono at 8 kHz, 2000·(1+id%5) one-byte
    * samples — the same 0.25·(1+id%5) s grid; 28-byte header (24
    * fixed + a 4-byte annotation pad). */
  private def au(id: Long): Array[Byte] =
    cat(cc(".snd"), be32(28), be32(2000L * (1 + (id % 5).toInt)),
      be32(1), be32(8000), be32(1), be32(0),
      Array.tabulate[Byte](2000 * (1 + (id % 5).toInt))(
        i => ((id + i) & 0x7f).toByte))

  /** Animated GIF, 11x7 screen, `1 + id % 4` frames at 40 ms. */
  private def gif(id: Long): Array[Byte] = {
    val n = 1 + (id % 4).toInt
    val hdr = cat(cc("GIF89a"), le16(11), le16(7), Array[Byte](0, 0, 0))
    val frame = cat(
      Array[Byte](0x21, 0xf9.toByte, 4, 0), le16(4), Array[Byte](0, 0),
      Array[Byte](0x2c), le16(0), le16(0), le16(11), le16(7),
      Array[Byte](0),
      Array[Byte](2, 2, (id & 3).toByte, 1, 0))
    cat((hdr +: Seq.fill(n)(frame)) :+ Array[Byte](0x3b): _*)
  }

  /** mp4 with one avc1 video track: `(1 + id % 6)` seconds at
    * timescale 1000, 320x240, `24 * seconds` samples with full sample
    * tables — mdhd (media timescale 1000), a two-run stts (all samples
    * at Δ41ms except the last at the remainder, so Σ = secs·1000
    * exactly), a two-run stsc (chunks of 10 then 7), and a variable
    * stsz whose sizes cycle deterministically from the id. */
  private def mp4(id: Long): Array[Byte] = {
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      cat(be32(body.length + 8L), cc(typ), body)
    val secs = 1 + (id % 6).toInt
    val n = 24 * secs
    val ftyp = box("ftyp", cat(cc("isom"), be32(512), cc("isom")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(1000), be32(secs * 1000L), Array.fill[Byte](80)(0)))
    val tkhd = box("tkhd", cat(be32(0), Array.fill[Byte](72)(0),
      be32(320L << 16), be32(240L << 16)))
    val mdhd = box("mdhd", cat(be32(0), be32(0), be32(0),
      be32(1000), be32(secs * 1000L), be32(0)))
    val stsd = box("stsd", cat(be32(0), be32(1),
      cat(be32(86), cc("avc1"), Array.fill[Byte](78)(0))))
    // (n-1) samples at 41 ticks + 1 closing sample at the remainder:
    // Σ count·delta = secs·1000 exactly, so trackDurMs == durationMs
    val lastDelta = secs * 1000L - (n - 1) * 41L
    val stts = box("stts", cat(be32(0), be32(2),
      be32(n - 1L), be32(41), be32(1), be32(lastDelta)))
    val stsc = box("stsc", cat(be32(0), be32(2),
      be32(1), be32(10), be32(0), // run 1: chunks 1.. hold 10 samples
      be32(3), be32(7), be32(0))) // run 2: from chunk 3, 7 per chunk
    val sizes = cat(scala.collection.immutable.ArraySeq.unsafeWrapArray(
      Array.tabulate(n)(i => be32(100L + ((id + i) % 50)))): _*)
    val stsz = box("stsz", cat(be32(0), be32(0), be32(n.toLong), sizes))
    // one sync sample per second (samples 1, 25, 49, …): the sparse-
    // keyframe shape a video pipeline cost-models GOP length from
    val stss = box("stss", cat(be32(0), be32(secs.toLong),
      cat(scala.collection.immutable.ArraySeq.unsafeWrapArray(
        Array.tabulate(secs)(i => be32(1L + 24L * i))): _*)))
    val stbl = box("stbl", cat(stsd, stts, stsc, stsz, stss))
    val mdia = box("mdia", cat(mdhd,
      box("hdlr", cat(be32(0), be32(0), cc("vide"), Array.fill[Byte](13)(0))),
      box("minf", stbl)))
    val moov = box("moov", cat(mvhd, box("trak", cat(tkhd, mdia))))
    val mdat = box("mdat",
      Array.tabulate[Byte](256)(i => ((id * 7 + i) & 0xff).toByte))
    cat(ftyp, mdat, moov)
  }

  /** Ogg Opus: id page + one data page whose granule encodes
    * `(1 + id % 4) / 2` seconds at 48 kHz. */
  private def ogg(id: Long): Array[Byte] = {
    // BOS flag (0x02) on the FIRST page only, like a real muxer —
    // a BOS after data pages would read as a chained-stream boundary
    def page(typ: Byte, gran: Long, payload: Array[Byte]): Array[Byte] =
      cat(cc("OggS"), Array[Byte](0, typ), le64(gran), le32(1), le32(0),
        le32(0), Array[Byte](1, payload.length.toByte), payload)
    val head = cat(cc("OpusHead"), Array[Byte](1, 2), le16(312),
      le32(48000), le16(0), Array[Byte](0))
    cat(page(2, 0, head), page(0, 24000L * (1 + id % 4),
      Array.tabulate[Byte](24)(i => (((id + i) & 0x3f) + 1).toByte)))
  }

  /** webm: EBML DocType header + unknown-size Segment with Info
    * (1 ms timecode scale, `(1 + id % 3) * 1000` tick duration) and one
    * V_VP9 track at 256x144. */
  private def webm(id: Long): Array[Byte] = {
    def el(eid: Array[Byte], body: Array[Byte]): Array[Byte] =
      cat(eid, Array[Byte]((0x80 | body.length).toByte), body)
    val hdr = el(Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte),
      el(Array[Byte](0x42, 0x82.toByte), cc("webm")))
    val ticks = (1 + id % 3) * 1000f
    val info = el(Array[Byte](0x15, 0x49, 0xa9.toByte, 0x66),
      cat(el(Array[Byte](0x2a, 0xd7.toByte, 0xb1.toByte), be32(1000000)),
        el(Array[Byte](0x44, 0x89.toByte),
          be32(java.lang.Float.floatToIntBits(ticks)))))
    val trk = el(Array[Byte](0x16, 0x54, 0xae.toByte, 0x6b),
      el(Array[Byte](0xae.toByte), cat(
        el(Array[Byte](0x86.toByte), cc("V_VP9")),
        el(Array[Byte](0xe0.toByte), cat(
          el(Array[Byte](0xb0.toByte), be16(256)),
          el(Array[Byte](0xba.toByte), be16(144)))))))
    // Cues seek index: one CuePoint (CueTime child) per second of the
    // clip — the keyframe-count signal, like the mp4 fixture's stss
    val nCues = (1 + id % 3).toInt
    val cues = el(Array[Byte](0x1c, 0x53, 0xbb.toByte, 0x6b),
      cat((0 until nCues).map(i => el(Array[Byte](0xbb.toByte),
        el(Array[Byte](0xb3.toByte), be16(i * 1000)))): _*))
    cat(hdr, Array[Byte](0x18, 0x53, 0x80.toByte, 0x67, 0xff.toByte),
      info, trk, cues)
  }

  /** REAL animated GIF via the ImageIO writer-sequence API (unlike
    * [[gif]], whose frames are structural filler): one
    * GraphicControlExtension per frame carrying `delayCs`. Frames must
    * be palette-safe for losslessness — the GIF writer QUANTIZES past
    * 256 colors, so callers feed grayscale frames (<= 256 colors by
    * construction) when decoded pixels must reproduce the input
    * exactly (the q149 video near-dup fixture contract). */
  def animatedGif(frames: Seq[java.awt.image.BufferedImage],
      delayCs: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { img =>
      val meta = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(img),
        writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    baos.toByteArray
  }

  /** One clip per id, format round-robin by `id % 7`. */
  def synth(id: Long): (Long, Array[Byte]) = (id, (id % 7) match {
    case 0 => mp3(id)
    case 1 => (id / 7) % 3 match { // the uncompressed-audio slot walks
      case 1 => aiff(id)           // all three container families
      case 2 => au(id)
      case _ => wav(id)
    }
    case 2 => gif(id)
    case 3 => mp4(id)
    case 4 => ogg(id)
    case 5 => webm(id)
    case _ => aacAdts(id)
  })
}
