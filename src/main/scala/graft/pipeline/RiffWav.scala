package graft.pipeline

/** Shared RIFF/WAVE chunk walk + little-endian field readers for every
  * WAV consumer in the pipeline (ImaAdpcm, MsAdpcm, MediaProbe) — one
  * walker so hardening fixes land once instead of per copy (the
  * near-2^32 declared-chunk-size stall class was fixed three separate
  * times before this existed).
  *
  * The walk advances in Long space: a declared chunk size near 2^32
  * truncates negative as an Int and would either stall the loop or
  * abort a decode whose fmt/data chunks were already found. Here an
  * unwalkable size just STOPS the walk, keeping whatever chunks were
  * already located (dataLen clamps to the buffer, so a huge declared
  * data size is safe to keep).
  */
private[pipeline] object RiffWav {

  def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  def le16s(b: Array[Byte], o: Int): Int = le16(b, o).toShort.toInt
  def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xff).toLong | ((b(o + 1) & 0xff).toLong << 8) |
      ((b(o + 2) & 0xff).toLong << 16) |
      ((b(o + 3) & 0xff).toLong << 24)) & 0xffffffffL
  def tag(b: Array[Byte], o: Int, s: String): Boolean =
    b.length >= o + 4 &&
      (0 until 4).forall(i => (b(o + i) & 0xff) == s.charAt(i))

  /** The fmt fields + data-chunk location of a RIFF/WAVE stream.
    * `dataLen` is clamped to the bytes actually present (what a decoder
    * can walk); `dataDeclared` is the chunk's declared size (what a
    * metadata probe wants for duration — probes often see only a prefix
    * window of the clip, so the declared size is the truthful one).
    * `fmtExtra` is the fmt chunk body BEYOND the 16 standard bytes —
    * cbSize + the codec-specific extension (MS-ADPCM keeps its
    * predictor-coefficient table there), clamped to the buffer. */
  final case class WavInfo(fmtTag: Int, channels: Int, rate: Int,
      byteRate: Long, blockAlign: Int, dataOff: Int, dataLen: Int,
      dataDeclared: Long, fmtExtra: Array[Byte] = Array.emptyByteArray)

  /** Walk the chunk list of a RIFF/WAVE byte stream; None when the
    * RIFF/WAVE magic is absent or no fmt chunk was found. */
  def parse(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes.length < 12 || !tag(bytes, 0, "RIFF") ||
        !tag(bytes, 8, "WAVE")) return None
    var fmtTag = -1; var ch = 0; var rate = 0
    var byteRate = 0L; var blockAlign = 0
    var dataOff = -1; var dataLen = 0; var dataDeclared = 0L
    var fmtExtra = Array.emptyByteArray
    var pos = 12L
    var run = true
    while (run && pos + 8 <= bytes.length) {
      val p = pos.toInt
      val size = le32(bytes, p + 4)
      val body = pos + 8
      if (tag(bytes, p, "fmt ") && size >= 16 && body + 16 <= bytes.length) {
        val bo = body.toInt
        fmtTag = le16(bytes, bo)
        ch = le16(bytes, bo + 2)
        rate = le32(bytes, bo + 4).toInt
        byteRate = le32(bytes, bo + 8)
        blockAlign = le16(bytes, bo + 12)
        if (size > 16) {
          val xEnd = math.min(body + size, bytes.length.toLong).toInt
          if (xEnd > bo + 16)
            fmtExtra = java.util.Arrays.copyOfRange(bytes, bo + 16, xEnd)
        }
      } else if (tag(bytes, p, "data") && dataOff < 0) {
        dataOff = body.toInt
        dataDeclared = size
        dataLen = math.min(size, (bytes.length - body).toLong).toInt
      }
      val next = body + size + (size & 1)
      if (next <= pos || next > Int.MaxValue) run = false else pos = next
    }
    if (fmtTag < 0) None
    else Some(WavInfo(fmtTag, ch, rate, byteRate, blockAlign,
      dataOff, math.max(0, dataLen), dataDeclared, fmtExtra))
  }
}
