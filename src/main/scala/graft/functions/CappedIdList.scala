package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded collect_list for LSH-style group-then-pair operators: collects
  * at most `cap` ids per group and yields NULL for any group that exceeds
  * the cap (callers drop those groups — they are stop-shingles / viral
  * keys whose in-group pair generation would be O(df²)).
  *
  * Unlike `collect_list` + a `size(...) <= cap` post-filter, the
  * aggregation buffer never grows past cap + 1 elements: once overflow is
  * detected the id array is dropped entirely, so one key shared by
  * millions of rows (a boilerplate shingle at 100 TB) costs O(1) reducer
  * memory, not O(df). Overflow is encoded as count == cap + 1, which
  * survives partial-aggregate merges by construction.
  *
  * The buffer is (count, array) with capacity doubling, so each reduce
  * is O(1) amortized — an earlier version did `arr :+ id` per row, a full
  * copy that made hot groups O(count²). The array may have spare
  * capacity; only the first `count` slots are meaningful.
  *
  * The returned array is sorted ascending, so downstream pair generation
  * gets a < b for free.
  */
class CappedIdList(cap: Int)
    extends Aggregator[Long, (Int, Array[Long]), Array[Long]] {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  private val overflow: (Int, Array[Long]) = (cap + 1, Array.emptyLongArray)

  override def zero: (Int, Array[Long]) = (0, Array.emptyLongArray)

  override def reduce(b: (Int, Array[Long]), a: Long): (Int, Array[Long]) = {
    val (n, arr) = b
    if (n > cap) b
    else if (n == cap) overflow
    else {
      val dst =
        if (n < arr.length) arr
        else {
          val grown = new Array[Long](
            math.min(math.max(4, arr.length * 2), cap))
          System.arraycopy(arr, 0, grown, 0, n)
          grown
        }
      dst(n) = a
      (n + 1, dst)
    }
  }

  override def merge(x: (Int, Array[Long]),
      y: (Int, Array[Long])): (Int, Array[Long]) = {
    if (x._1 > cap) overflow
    else if (y._1 > cap) overflow
    else {
      val total = x._1 + y._1
      if (total > cap) overflow
      else {
        val m = new Array[Long](total)
        System.arraycopy(x._2, 0, m, 0, x._1)
        System.arraycopy(y._2, 0, m, x._1, y._1)
        (total, m)
      }
    }
  }

  override def finish(b: (Int, Array[Long])): Array[Long] =
    if (b._1 > cap) null
    else {
      val out = java.util.Arrays.copyOf(b._2, b._1)
      java.util.Arrays.sort(out)
      out
    }

  override def bufferEncoder: Encoder[(Int, Array[Long])] =
    ExpressionEncoder[(Int, Array[Long])]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
