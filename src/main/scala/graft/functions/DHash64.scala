package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType,
  LongType}

/** dhash64(data, width, height, channels): 64-bit difference hash
  * (dHash) of a DECODED image — the pixel-space near-duplicate key for
  * image corpora, where exact byte/md5 dedup is defeated by the
  * resize/re-encode copies a crawl actually contains (the reference's
  * own format list is what the decode stage feeds this:
  * /root/reference/src/piper/utils/constants.py:2, decoded per
  * /root/reference/src/piper/spark/data_augment.py:42-60).
  *
  * The arithmetic is INTEGER-ONLY so a SQL oracle can replay it
  * bit-for-bit (the q35 MD5/mix61 discipline, applied to pixels):
  *
  *  1. grayscale: per pixel, the floor-mean of the first three
  *     channels ((c0+c1+c2)/3 — channel ORDER-invariant, so BGR vs RGB
  *     cannot drift it; 1-/2-channel images use channel 0; alpha and
  *     further channels are ignored);
  *  2. downsample to a 9-wide x 8-tall grid: pixel (x, y) belongs to
  *     cell (x*9/W, y*8/H) (integer floor — an exact partition, unlike
  *     interpolation kernels whose float weights no two engines agree
  *     on), cell value = floor(sum/count);
  *  3. bits: bit (ty*8 + tx) is set iff cell(tx+1, ty) > cell(tx, ty)
  *     — 8 horizontal gradient signs per row x 8 rows = 64 bits,
  *     packed little-endian into one signed long (bit 63 lands in the
  *     sign; Hamming via bit_count(xor) is sign-agnostic).
  *
  * Gradient SIGNS survive the global brightness/contrast shifts and
  * mild resampling that re-encoded copies carry — that robustness (not
  * cryptographic spread) is the point of dHash; near-dup pairs are
  * then found sub-quadratically by banding the 64 bits (the q36/q68
  * simhash block-key pattern) and verified by Hamming distance.
  *
  * Returns NULL (never throws) when the declared shape is invalid —
  * non-positive dims, a grid wider/taller than the image (W < 9 or
  * H < 8 leaves empty cells), or a byte count that contradicts
  * W*H*C: one corrupt row in a 100 TB corpus must not kill the task
  * (the MediaProbe bounded-output contract). Codegen'd as a static
  * call so the hash stays inside whole-stage codegen (the
  * JlProject/MinhashBands idiom).
  */
case class DHash64(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType, IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"dhash64 expects (binary data, int width, int height, " +
          s"int channels), got (${a.simpleString}, ${b.simpleString}, " +
          s"${c.simpleString}, ${d.simpleString})")
    }

  override def dataType: DataType = LongType
  // NULL both for null inputs (nullIntolerant) and for shape-invalid
  // rows (the hash function's own degradation path)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dhash64"

  override protected def nullSafeEval(data: Any, w: Any, h: Any,
      c: Any): Any =
    DHash64.hash(data.asInstanceOf[Array[Byte]], w.asInstanceOf[Int],
      h.asInstanceOf[Int], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, w, h, c) => {
      val res = ctx.freshName("dhashRes")
      s"""
        java.lang.Long $res = graft.functions.DHash64.hash($d, $w, $h, $c);
        if ($res == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $res.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object DHash64 {
  /** Grid shape: 9 columns x 8 rows -> 8 horizontal comparisons per
    * row x 8 rows = exactly 64 bits. */
  val GridW = 9
  val GridH = 8

  /** The hash body (see the expression scaladoc for the contract).
    * Boxed return: null = invalid shape, degrade instead of throwing. */
  def hash(data: Array[Byte], w: Int, h: Int, c: Int): java.lang.Long = {
    if (data == null || w < GridW || h < GridH || c < 1 ||
        w.toLong * h * c != data.length) return null
    val sum = new Array[Long](GridW * GridH)
    val cnt = new Array[Long](GridW * GridH)
    var y = 0
    while (y < h) {
      val ty = y * GridH / h
      var x = 0
      while (x < w) {
        val tx = x * GridW / w
        val base = (y * w + x) * c
        val g =
          if (c >= 3)
            ((data(base) & 0xff) + (data(base + 1) & 0xff) +
              (data(base + 2) & 0xff)) / 3
          else data(base) & 0xff
        sum(ty * GridW + tx) += g
        cnt(ty * GridW + tx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var ty = 0
    while (ty < GridH) {
      var tx = 0
      while (tx < GridW - 1) {
        val a = sum(ty * GridW + tx) / cnt(ty * GridW + tx)
        val b = sum(ty * GridW + tx + 1) / cnt(ty * GridW + tx + 1)
        if (b > a) hash |= 1L << (ty * (GridW - 1) + tx)
        tx += 1
      }
      ty += 1
    }
    hash
  }
}
