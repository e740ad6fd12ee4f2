package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** audiofp64(samples): 64-bit acoustic fingerprint of DECODED mono PCM
  * — the content key for audio near-duplicate detection (q150/q151),
  * where exact byte/md5 dedup is defeated by the re-encoded (WAV ->
  * AIFF/FLAC) and gain-adjusted copies an audio crawl actually
  * contains. The dHash discipline applied to sound: dHash compares
  * spatial cell means by SIGN; this compares temporal window energies
  * by sign.
  *
  *  1. samples arrive as the engine's decode output (AudioOps
  *     .decodeWav: value / 32768, EXACT for PCM16 since 32768 is a
  *     power of two) and are reconstructed to integers by
  *     round(v * 32768) — so the whole fingerprint is INTEGER
  *     arithmetic a SQL oracle replays bit-for-bit (the DHash64
  *     discipline);
  *  2. the signal is split into 65 equal time windows — sample i
  *     belongs to window i*65/n (integer floor, an exact partition);
  *     window energy = sum of |sample| (Long — no overflow below
  *     2^48 samples);
  *  3. bit w (0..63) is set iff energy(w+1) > energy(w) — 64
  *     energy-delta signs, packed little-endian into one signed long
  *     (bit 63 lands in the sign; Hamming via bit_count(xor) is
  *     sign-agnostic).
  *
  * Energy-delta SIGNS survive exactly the transforms a re-encoded
  * copy carries: any POSITIVE GAIN scales every window energy by the
  * same factor (signs untouched — for integer gains, bit-exactly;
  * spec-pinned), and lossless container changes (WAV <-> AIFF <-> AU,
  * all PCM16) decode to identical samples. Near-dup pairs are then
  * found sub-quadratically by the same capped 4x16 banding as image
  * dHash (graft.operators.HashBands) — silence fingerprints to
  * exactly 0, the audio analog of the flat-image hot bucket, so the
  * cap is load-bearing here too.
  *
  * Returns NULL (never throws) for signals shorter than 65 samples
  * (empty windows would make the delta signs read uninitialized
  * zeros) and for arrays containing null entries: one corrupt row in
  * a 100 TB corpus must not kill the task (the DHash64/MediaProbe
  * bounded-degradation contract). Codegen'd as a static call so the
  * fingerprint stays inside whole-stage codegen.
  */
case class AudioFp64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audiofp64 expects array<double> samples, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "audiofp64"

  override protected def nullSafeEval(samples: Any): Any =
    AudioFp64.fp(samples.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val res = ctx.freshName("afpRes")
      s"""
        java.lang.Long $res = graft.functions.AudioFp64.fp($d);
        if ($res == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $res.longValue(); }
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object AudioFp64 {
  /** 65 windows -> 64 energy-delta sign bits. */
  val Windows = 65

  /** The fingerprint body (see the expression scaladoc for the
    * contract). Boxed return: null = too short / corrupt, degrade
    * instead of throwing. */
  def fp(samples: ArrayData): java.lang.Long = {
    if (samples == null) return null
    val n = samples.numElements()
    if (n < Windows) return null
    val e = new Array[Long](Windows)
    var i = 0
    while (i < n) {
      if (samples.isNullAt(i)) return null
      e((i.toLong * Windows / n).toInt) +=
        math.abs(math.round(samples.getDouble(i) * 32768.0))
      i += 1
    }
    var h = 0L
    var w = 0
    while (w < Windows - 1) {
      if (e(w + 1) > e(w)) h |= 1L << w
      w += 1
    }
    h
  }
}
