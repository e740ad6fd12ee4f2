package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable MinHash sketch as a typed Aggregator: one pass over token
  * sets per group, `numHashes` independent min-hashes, elementwise-min
  * merge — i.e. a proper distributed sketch (map-side partial sketches
  * combine associatively, unlike the explode+groupBy formulation in q35
  * which shuffles every token).
  *
  * Jaccard similarity between two groups is estimated by the fraction of
  * positions where their sketches agree (property-tested in
  * MinHashAggSpec). Hashing is FNV-1a-64 with a per-position seed — fully
  * deterministic and engine-independent.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[Seq[String], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], tokens: Seq[String]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      var m = buf(i)
      tokens.foreach { t =>
        val h = MinHashAggregator.fnv1a64(i, t)
        if (h < m) m = h
      }
      buf(i) = m
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { a(i) = math.min(a(i), b(i)); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAggregator {
  /** Seeded FNV-1a over the UTF-8 bytes (stable across JVMs). */
  def fnv1a64(seed: Int, s: String): Long = {
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Estimated Jaccard = fraction of agreeing sketch positions. */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
