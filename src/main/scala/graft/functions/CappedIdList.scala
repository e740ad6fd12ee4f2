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
  * detected the buffer stops accepting ids, so one key shared by millions
  * of rows (a boilerplate shingle at 100 TB) costs O(cap) reducer memory,
  * not O(df). Overflow is encoded as length == cap + 1, which survives
  * partial-aggregate merges by construction.
  *
  * The returned array is sorted ascending, so downstream pair generation
  * gets a < b for free.
  */
class CappedIdList(cap: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] =
    if (b.length > cap) b else b :+ a

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.length > cap) x
    else if (y.length > cap) y
    else {
      val m = new Array[Long](math.min(x.length + y.length, cap + 1))
      System.arraycopy(x, 0, m, 0, x.length)
      System.arraycopy(y, 0, m, x.length, m.length - x.length)
      m
    }

  override def finish(b: Array[Long]): Array[Long] =
    if (b.length > cap) null
    else {
      val out = b.clone()
      java.util.Arrays.sort(out)
      out
    }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
