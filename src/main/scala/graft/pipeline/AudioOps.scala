package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem}

/** Real audio decode for WAV/PCM byte streams — javax.sound.sampled ships
  * in the JDK, so no external codec is required. Compressed codecs
  * (mp3/ogg/aac) are NOT decodable in this container and stay behind the
  * documented stub in [[Multimodal]].
  *
  * Scalar helpers only (no Spark types): called from partition-parallel
  * Dataset maps, mirroring how ImageOps backs the image pipeline.
  */
object AudioOps {

  /** Decode a WAV byte stream to (sampleRate, mono samples in [-1, 1]).
    * Multi-channel input is averaged to mono; any PCM encoding the JDK
    * can convert (u8 / s16 / s24 / s32, either endianness) is normalized
    * through a signed-16-bit little-endian pivot. None for byte streams
    * javax.sound cannot parse (e.g. compressed codecs). */
  def decodeWav(bytes: Array[Byte]): Option[(Float, Array[Double])] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        fmt.getSampleRate, 16, fmt.getChannels, fmt.getChannels * 2,
        fmt.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      val data =
        try pcm.readAllBytes()
        finally { pcm.close(); in.close() }
      val ch = fmt.getChannels
      val n = data.length / 2 / ch
      val mono = new Array[Double](n)
      var i = 0
      while (i < n) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val o = 2 * (i * ch + c)
          acc += (((data(o + 1) << 8) | (data(o) & 0xff)).toShort) / 32768.0
          c += 1
        }
        mono(i) = acc / ch
        i += 1
      }
      Some((fmt.getSampleRate, mono))
    } catch { case _: Exception => None }

  /** REAL PCM16 mono encode through the JDK's own writers — WAV
    * (little-endian) or AIFF (big-endian), the decodeWav-readable
    * containers. The audio fixtures' encode half of the
    * encode->decode roundtrip (the ImageOps.pngEncode discipline):
    * PCM16 is lossless, so decodeWav(encodePcm16(s)) * 32768 == s
    * exactly (spec-pinned), which is what lets the q150 oracle replay
    * the sample formula in integer SQL. Samples must be within
    * [-32768, 32767]; out-of-range values are a caller bug — require,
    * don't clip (a silent clip would break the oracle's replay). */
  def encodePcm16(samples: Array[Int], rate: Float,
      aiff: Boolean = false): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      require(s >= -32768 && s <= 32767, s"sample $s out of PCM16 range")
      if (aiff) { // big-endian
        data(2 * i) = (s >> 8).toByte
        data(2 * i + 1) = s.toByte
      } else { // little-endian
        data(2 * i) = s.toByte
        data(2 * i + 1) = (s >> 8).toByte
      }
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      1, 2, rate, aiff)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt,
      samples.length)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais,
      if (aiff) AudioFileFormat.Type.AIFF else AudioFileFormat.Type.WAVE,
      out)
    out.toByteArray
  }

  /** Per-segment RMS energies: the signal split into `nSeg` equal time
    * segments, one root-mean-square value per segment. The standard
    * cheap "energy band" descriptor for filtering silence / clipping in
    * audio curation. Empty signals yield all-zero features. */
  def segmentEnergies(samples: Array[Double], nSeg: Int): Array[Float] = {
    require(nSeg >= 1, s"nSeg must be >= 1, got $nSeg")
    val out = new Array[Float](nSeg)
    if (samples.isEmpty) return out
    var s = 0
    while (s < nSeg) {
      val from = (samples.length.toLong * s / nSeg).toInt
      val until = (samples.length.toLong * (s + 1) / nSeg).toInt
      if (until > from) {
        var acc = 0.0
        var i = from
        while (i < until) { acc += samples(i) * samples(i); i += 1 }
        out(s) = math.sqrt(acc / (until - from)).toFloat
      }
      s += 1
    }
    out
  }
}
