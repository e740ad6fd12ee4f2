package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable HyperLogLog sketch as a typed Aggregator: 2^p byte
  * registers, FNV-1a hashing, register-wise max merge — the classic
  * distributed cardinality sketch (the engine's own analog of
  * approx_count_distinct, exposed so sketches can be stored, merged
  * across partitions/days, and estimated later — which the built-in
  * aggregate cannot do).
  *
  * Estimator: raw HLL alpha * m² / sum(2^-reg) with linear counting for
  * the small range (the only regimes the fixtures exercise; the
  * large-range correction is unnecessary for 64-bit hashes).
  */
class HllAggregator(p: Int = 12) extends Aggregator[String, Array[Byte], Long] {
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  // murmur3 fmix64 finalizer: FNV-1a alone has poor high-bit avalanche,
  // and HLL derives both the register index and the rank from the top
  // bits (estimates came out ~30x low without this)
  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33; h
  }

  override def reduce(reg: Array[Byte], value: String): Array[Byte] = {
    val h = fmix(MinHashAggregator.fnv1a64(0x5bd1, value))
    val idx = (h >>> (64 - p)).toInt
    // rank = leading zeros of the remaining bits + 1, capped
    val rest = h << p
    val rank = (if (rest == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > reg(idx)) reg(idx) = rank.toByte
    reg
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(reg: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += math.pow(2.0, -reg(i))
      if (reg(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
