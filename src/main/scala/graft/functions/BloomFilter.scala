package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Mergeable Bloom filter as a typed Aggregator over pre-hashed 64-bit
  * keys (feed it `xxhash64(key)`), plus the codegen'd membership probe
  * [[BloomMightContain]] (`bloom_might_contain(bf, xxhash64(key))`).
  *
  * This is the semi-join REDUCTION primitive: build the filter on the
  * small/selective side (one binary blob, OR-mergeable up the aggregate
  * tree), broadcast that ONE row, and drop non-matching probe rows
  * map-side BEFORE they pay the shuffle. False positives just ride
  * through to the exact join that follows; false negatives cannot
  * happen, so the composed result is bit-identical to the plain join —
  * at 100 TB the win is shuffling only the ~matching fraction of the
  * fact table. (Spark's own `InjectRuntimeFilter` applies the same idea
  * automatically in narrow cases; this surface makes it an explicit,
  * storable, mergeable operator.)
  *
  * Bit positions come from Kirsch–Mitzenmacher double hashing of the
  * input hash — no per-row re-hash of the key bytes — with
  * `remainderUnsigned` indexing, so any filter length works (power-of-2
  * sizes are still the sensible choice). `numHashes` is fixed at
  * [[BloomFilter.K]] for both build and probe so the two can never
  * drift.
  */
class BloomFilterAgg(numBits: Int = 1 << 19)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(numBits >= 8 && numBits % 8 == 0,
    s"numBits must be a positive multiple of 8, got $numBits")
  private val nBytes = numBits / 8

  override def zero: Array[Byte] = new Array[Byte](nBytes)

  override def reduce(bits: Array[Byte], h: Long): Array[Byte] = {
    BloomFilter.set(bits, h)
    bits
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < nBytes) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(bits: Array[Byte]): Array[Byte] = bits

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomFilter {
  /** Hash-function count, shared by build and probe. k = 6 is optimal
    * near m/n ≈ 8.7 bits per key; the q93 sizing (2^20 bits, ~30k keys
    * at sf0.1, ~35 bits/key) gives FP = (1−e^(−kn/m))^6 ≈ 1.5e-5 — k=6
    * is below that ratio's ~24-hash optimum, trading a few FPs (the
    * exact join absorbs them) for a 4x cheaper probe. */
  val K = 6

  // Kirsch–Mitzenmacher: g_i = h + i * h2 simulates K independent
  // hashes from one 64-bit input; the xor-fold spreads high bits before
  // the modulo
  private def idx(h: Long, h2: Long, i: Int, mBits: Long): Int = {
    val g = h + i * h2
    java.lang.Long.remainderUnsigned(g ^ (g >>> 33), mBits).toInt
  }

  private def h2Of(h: Long): Long =
    (java.lang.Long.rotateLeft(h, 32) * 0x9E3779B97F4A7C15L) | 1L

  def set(bits: Array[Byte], h: Long): Unit = {
    val m = bits.length.toLong * 8
    val h2 = h2Of(h)
    var i = 0
    while (i < K) {
      val b = idx(h, h2, i, m)
      bits(b >>> 3) = (bits(b >>> 3) | (1 << (b & 7))).toByte
      i += 1
    }
  }

  /** Conservative on malformed input: a zero-length filter answers
    * "might contain" (never wrong for pruning). */
  def mightContain(bits: Array[Byte], h: Long): Boolean = {
    if (bits.length == 0) return true
    val m = bits.length.toLong * 8
    val h2 = h2Of(h)
    var i = 0
    while (i < K) {
      val b = idx(h, h2, i, m)
      if ((bits(b >>> 3) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** `bloom_might_contain(bf BINARY, h BIGINT) -> BOOLEAN` — see
  * [[BloomFilter]]. Codegen'd as a static call so the probe filter
  * stays inside the scan's whole-stage-codegen span. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_might_contain requires (BINARY, BIGINT), got " +
        Seq(left, right).map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(bf: Any, h: Any): Any =
    java.lang.Boolean.valueOf(BloomFilter.mightContain(
      bf.asInstanceOf[Array[Byte]], h.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (bf, h) => s"graft.functions.BloomFilter.mightContain($bf, $h)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
