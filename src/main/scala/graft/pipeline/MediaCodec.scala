package graft.pipeline

/** The compressed-media decode seam: everything this container cannot do
  * for real (mp3/ogg/aac audio decode, video demux/frame decode) sits
  * behind this ONE injectable value, mirroring the `util.Ingest`
  * HTTP-client seam. The Spark-side plumbing — schema, batch shape,
  * partitioning, drop-undecodable policy — is identical whichever
  * implementation is plugged in, so a codec-equipped deploy swaps
  * [[MediaCodec.Stub]] for a real decoder without touching any pipeline
  * code. Implementations must be Serializable (they ship inside task
  * closures) and should be deterministic per byte-input so reruns and
  * retried tasks agree.
  */
trait MediaCodec extends Serializable {

  /** Compressed-audio decode + feature step: `nMel` energies per clip,
    * or None when the bytes cannot be decoded — the row is dropped,
    * matching the image pipeline's drop-undecodable policy. (WAV/PCM
    * needs no codec: use [[Multimodal.audioFeatures]], which decodes
    * for real via javax.sound.) */
  def audioFeatures(bytes: Array[Byte], nMel: Int): Option[Array[Float]]

  /** Video demux + frame sampling: one (tsMs, frameBytes) pair per
    * sampled frame — at most `maxFrames`, one every `everyMs`. */
  def sampleFrames(bytes: Array[Byte], everyMs: Long,
      maxFrames: Int): Seq[(Long, Array[Byte])]
}

object MediaCodec {

  /** REAL pure-JVM codec (the default for compressed-audio features):
    * decodes native FLAC via [[Flac]] (lossless compression — Rice-coded
    * LPC/fixed prediction, stereo decorrelation) and IMA/DVI ADPCM WAV
    * via [[ImaAdpcm]] (lossy ~4:1) and Microsoft ADPCM via [[MsAdpcm]]
    * — all actual compressed codecs, bytes-in/samples-out tested — and
    * falls back to anything the JDK's javax.sound parses (PCM / u-law /
    * a-law WAV) via [[AudioOps.decodeWav]]. mp3/ogg/aac stay
    * undecodable here (None -> row dropped), DELIBERATELY: those are
    * table-driven codecs whose standardized constant tables (the 34
    * ISO 11172-3 Layer III Huffman code tables, the Vorbis/AAC
    * codebooks) are not derivable from first principles and not
    * available in this zero-egress container — a decoder built with
    * guessed tables would pass a self-consistent encoder-twin test and
    * still emit garbage on every real-world file, strictly worse than
    * the honest drop. The blocker is not just Huffman: even the
    * Huffman-FREE MPEG layers (I/II, plain bit-allocation + linear
    * quantization) cannot be decoded faithfully without ISO 11172-3
    * Table B.3 — the 512-coefficient synthesis-filterbank prototype
    * window, a numerically-optimized design published only as a data
    * table (the matrixing cosines ARE closed-form; the window is not).
    * Structural mp3/mp4/ogg/webm METADATA (codec id, duration, rate,
    * channels, frame offsets) needs none of those tables and is parsed
    * for real by [[MediaProbe]] — at 100 TB that is what lets a
    * pipeline filter/bucket/cost-model media rows and route only the
    * wanted subset through a codec-equipped deploy. The implemented codecs (FLAC, both ADPCMs) are
    * ALGORITHMIC — Rice coding, LPC, step adaptation — so their
    * correctness is provable without the standard's data tables. A
    * codec-equipped deploy plugs its own [[MediaCodec]] in. Video [[sampleFrames]] demuxes + decodes FOR
    * REAL from three containers: animated GIF ([[GifFrames]] — timed
    * LZW frames composited per disposal method), AVI/MJPEG
    * ([[AviMjpeg]] — RIFF demux + per-frame baseline JPEG) and
    * QuickTime/mp4 MJPEG ([[Mp4Mjpeg]] — box-tree demux through the
    * full stts/stsz/stsc/stco sample tables, per-sample JPEG); every
    * inter-frame codec (h264/vp9/av1 in mp4/webm/mkv) is undecodable
    * here and its rows are dropped, same policy as audio. */
  object Jvm extends MediaCodec {

    override def audioFeatures(bytes: Array[Byte],
        nMel: Int): Option[Array[Float]] =
      Flac.decode(bytes).orElse(ImaAdpcm.decode(bytes))
        .orElse(MsAdpcm.decode(bytes))
        .orElse(AudioOps.decodeWav(bytes))
        .map { case (_, mono) => AudioOps.segmentEnergies(mono, nMel) }

    override def sampleFrames(bytes: Array[Byte], everyMs: Long,
        maxFrames: Int): Seq[(Long, Array[Byte])] =
      GifFrames.sample(bytes, everyMs, maxFrames)
        .orElse(AviMjpeg.sample(bytes, everyMs, maxFrames))
        .orElse(Mp4Mjpeg.sample(bytes, everyMs, maxFrames))
        .getOrElse(Seq.empty)
  }

  /** STUB — deterministic fakes, honestly marked: this container ships
    * no mp3/ogg/aac or video codecs, so decode is faked while the
    * distributed plumbing stays real and tested. Pseudo-mel energies
    * are a byte-stride hash of the content; pseudo-frames are byte
    * slices, preserving the one-row-per-frame output shape. */
  object Stub extends MediaCodec {

    override def audioFeatures(bytes: Array[Byte],
        nMel: Int): Option[Array[Float]] =
      Some(Array.tabulate(nMel) { m =>
        var acc = 0L
        var i = m
        while (i < bytes.length) { acc = acc * 31 + (bytes(i) & 0xff); i += nMel }
        (acc & 0xffff).toFloat / 0xffff
      })

    override def sampleFrames(bytes: Array[Byte], everyMs: Long,
        maxFrames: Int): Seq[(Long, Array[Byte])] = {
      val n = math.min(maxFrames, math.max(1, bytes.length / 16))
      (0 until n).map { f =>
        val start = f * (bytes.length / n)
        (f.toLong * everyMs, bytes.slice(start, start + 16))
      }
    }
  }
}
