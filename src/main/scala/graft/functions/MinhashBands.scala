package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The shared minhash family constants: 16 Carter–Wegman affine hashes
  * over Z_M61 derived from one hash60 digest per shingle, combined into
  * 4 band fingerprints by a nonzero-weight linear combination (distinct
  * signature tuples collide with probability 1/M61 — exact, not
  * heuristic). ONE source for the native fused kernel below, the SQL
  * formulations in graft.queries.Dedup (grouped reference + oracle
  * generation), and the streaming twin — LSH bucket compatibility
  * across all of them depends on these never drifting.
  */
object MinhashFamily {
  val nBands = 4
  val rowsPerBand = 4
  val nHash: Int = nBands * rowsPerBand
  val M61: Long = Mix61.M61

  val mixA: Array[Long] = // in [1, M61): nonzero multiplier
    (0 until nHash).map(i =>
      (((0x9E3779B97F4A7C15L * (2 * i + 1)) >>> 3) % M61) max 1L).toArray
  val mixB: Array[Long] = // in [0, M61)
    (0 until nHash).map(i =>
      ((0xC2B2AE3D27D4EB4FL * (i + 1)) >>> 3) % M61).toArray
  val bandP: Array[Long] = // nonzero band-combination weights
    (0 until rowsPerBand).map(r =>
      (((0x2545F4914F6CDD1DL * (2 * r + 3)) >>> 3) % M61) max 1L).toArray
}

/** minhash_bands(tok): the document's `nBands` LSH band fingerprints as
  * ARRAY<BIGINT>, or NULL when the token array has fewer than 3 tokens
  * (no 3-shingles — such documents are near-dup-immune, matching the
  * exploded formulation where they emit no band rows).
  *
  * Value-identical to the layered SQL pipeline
  * `transform(shingles3(tok), x -> hash60(x))` + 16×
  * `array_min(transform(__hs, h -> mix61(h, Ai, Bi)))` + the bandP
  * fold (bit-parity pinned in DedupSpec against the grouped reference),
  * but ONE fused pass: per 3-gram it runs one MD5 and 16 mix61 steps
  * against running minima — no intermediate shingle/digest arrays, no
  * CodegenFallback lambda interpretation, no per-family re-scan of the
  * digest array. Shingle dedup is skipped on purpose: min() is
  * duplicate-insensitive, so the distinct step of the layered shape is
  * a no-op here. This is the hottest projection of the dedup pipeline
  * (q35/q67/q73/q102/q104 + streaming all fingerprint every document).
  *
  * Codegen'd as a static call into the companion so the per-document
  * projection stays inside whole-stage codegen.
  */
case class MinhashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires ARRAY<STRING>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(v: Any): Any =
    MinhashBands.bands(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashBands.bands($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinhashBands {
  import MinhashFamily._

  private val space = Array[Byte](' ')

  /** Null iff fewer than 3 tokens (no shingles). */
  def bands(tok: ArrayData): ArrayData = {
    val n = tok.numElements()
    if (n < 3) return null
    val mins = new Array[Long](nHash)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sep = UTF8String.fromBytes(space)
    var i = 0
    while (i < n - 2) {
      val s = UTF8String.concatWs(sep, tok.getUTF8String(i),
        tok.getUTF8String(i + 1), tok.getUTF8String(i + 2))
      val h = Hash60.eval60(s)
      var k = 0
      while (k < nHash) {
        val v = Mix61.mix(h, mixA(k), mixB(k))
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var acc = 0L
      var r = 0
      while (r < rowsPerBand) {
        acc = Mix61.mix(mins(b * rowsPerBand + r), bandP(r), acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}
