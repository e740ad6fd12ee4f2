package graft.pipeline

import scala.collection.mutable.ArrayBuilder

/** Pure-JVM decoder for IMA/DVI ADPCM audio in a WAV container (RIFF
  * format tag 0x0011) — a REAL compressed codec (4 bits/sample vs 16,
  * ~4:1) with a public specification (IMA Digital Audio Focus and
  * Technical Working Groups, "Recommended Practices for Enhancing
  * Digital Audio Compatibility", rev 3.00, 1992), closing part of the
  * MediaCodec seam without any external codec library: the JDK's
  * javax.sound only handles uncompressed PCM (+ u-law/a-law), and
  * mp3/ogg/aac decoders do not exist in this offline container.
  *
  * Layout per the spec: each `nBlockAlign` block carries, per channel, a
  * 4-byte header (initial predictor as int16 LE — which IS the block's
  * first output sample — an initial step-table index, and a reserved
  * byte), then channel-interleaved 4-byte words of eight 4-bit codes
  * each, LOW nibble first. Each code reconstructs
  * `diff = step/8 + (bit2)*step + (bit1)*step/2 + (bit0)*step/4`,
  * subtracted when bit3 is set, with predictor clamped to int16 and the
  * step index advanced by the standard index table.
  *
  * Scalar helper (no Spark types), called from partition-parallel maps
  * like AudioOps/ImageOps; deterministic per byte-input. Multi-channel
  * input is averaged to mono in [-1, 1], matching AudioOps.decodeWav.
  */
object ImaAdpcm {

  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)
  private val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  import RiffWav.le16s

  /** One IMA step: returns the new (predictor, stepIndex) packed as a
    * Long (pred in the high int) — exposed for the encoder twin in
    * tests; both sides MUST share this reconstruction or decode drifts
    * from the encoder's tracked state. */
  def advance(pred: Int, idx: Int, code: Int): Long = {
    val step = StepTable(idx)
    var diff = step >> 3
    if ((code & 4) != 0) diff += step
    if ((code & 2) != 0) diff += step >> 1
    if ((code & 1) != 0) diff += step >> 2
    val p0 = if ((code & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + IndexTable(code)))
    (p.toLong << 32) | (i.toLong & 0xffffffffL)
  }

  /** Decode an IMA-ADPCM WAV byte stream to (sampleRate, mono samples
    * in [-1, 1]); None when the bytes are not a well-formed WAV with
    * format tag 0x0011 (callers fall back to other decoders or drop). */
  def decode(bytes: Array[Byte]): Option[(Float, Array[Double])] = {
    try {
      val w = RiffWav.parse(bytes).getOrElse(return None)
      val ch = w.channels; val rate = w.rate
      val blockAlign = w.blockAlign
      val dataOff = w.dataOff; val dataLen = w.dataLen
      if (w.fmtTag != 0x0011 || ch < 1 || rate <= 0 || dataOff < 0 ||
          blockAlign < 4 * ch) return None

      val pred = new Array[Int](ch)
      val idx = new Array[Int](ch)
      val mono = ArrayBuilder.make[Double]
      val end = dataOff + dataLen
      var b = dataOff
      while (b + 4 * ch <= end) {
        val blockEnd = math.min(b + blockAlign, end)
        var c = 0
        var headAcc = 0.0
        while (c < ch) {
          pred(c) = le16s(bytes, b + 4 * c)
          idx(c) = math.max(0, math.min(88, bytes(b + 4 * c + 2) & 0xff))
          headAcc += pred(c)
          c += 1
        }
        mono += headAcc / ch / 32768.0 // the header predictor IS sample 0
        var p = b + 4 * ch
        while (p + 4 * ch <= blockEnd) {
          var s = 0
          while (s < 8) { // 8 codes per 4-byte word, low nibble first
            var acc = 0.0
            var c2 = 0
            while (c2 < ch) {
              val raw = bytes(p + 4 * c2 + (s >> 1)) & 0xff
              val code = if ((s & 1) == 0) raw & 0xf else (raw >> 4) & 0xf
              val packed = advance(pred(c2), idx(c2), code)
              pred(c2) = (packed >> 32).toInt
              idx(c2) = (packed & 0xffffffffL).toInt
              acc += pred(c2)
              c2 += 1
            }
            mono += acc / ch / 32768.0
            s += 1
          }
          p += 4 * ch
        }
        b += blockAlign
      }
      Some((rate.toFloat, mono.result()))
    } catch { case _: Exception => None }
  }
}
