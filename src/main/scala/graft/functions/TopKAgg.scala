package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (value, id) candidate for the bounded top-k aggregate. */
case class TopKEntry(v: Double, id: Long)

/** Mutable bounded buffer: entries are appended unsorted and compacted
  * to the best k whenever the buffer doubles past k — O(1) amortized
  * per row, O(k) state. */
final class TopKBuf extends Serializable {
  val entries = new ArrayBuffer[TopKEntry]()
}

/** Bounded top-k per group — the scale-correct replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` window
  * when only the top k rows per group are wanted: the window shape
  * shuffles and sorts EVERY row of every group, while this aggregator
  * keeps O(k) state per group, aggregates map-side, and merges
  * associatively up the tree — the per-group analog of what
  * TakeOrderedAndProject does globally for q02.
  *
  * Ordering is total and deterministic: higher `v` wins, ties break to
  * the smaller `id` — identical to ORDER BY v DESC, id in the oracle.
  * The finished value is the sorted top-k list (best first).
  */
class TopKAgg(k: Int)
    extends Aggregator[TopKEntry, TopKBuf, Seq[TopKEntry]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // best first: v desc, then id asc — via Double.compare with -0.0
  // normalized to 0.0, matching SQL ORDER BY semantics exactly: NaN
  // sorts as the LARGEST value (key negation would send NaN last
  // instead), and 0.0/-0.0 tie on the id rather than on sign
  private val ord: Ordering[TopKEntry] = new Ordering[TopKEntry] {
    private def norm(v: Double) = if (v == 0.0) 0.0 else v
    override def compare(a: TopKEntry, b: TopKEntry): Int = {
      val c = java.lang.Double.compare(norm(b.v), norm(a.v))
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  private def compact(b: TopKBuf): Unit =
    if (b.entries.length > k) {
      val best = b.entries.sorted(ord).take(k)
      b.entries.clear()
      b.entries ++= best
    }

  override def zero: TopKBuf = new TopKBuf

  override def reduce(b: TopKBuf, e: TopKEntry): TopKBuf = {
    b.entries += e
    if (b.entries.length > 2 * k) compact(b)
    b
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    x.entries ++= y.entries
    compact(x)
    x
  }

  override def finish(b: TopKBuf): Seq[TopKEntry] = {
    compact(b)
    b.entries.sorted(ord).toSeq
  }

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.kryo[TopKBuf]
  override def outputEncoder: Encoder[Seq[TopKEntry]] =
    ExpressionEncoder[Seq[TopKEntry]]()
}
