package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters buffer: raw per-term counts plus one global
  * `offset`, where a term's effective count is `raw - offset` and a term
  * is live iff `raw > offset`. The classic decrement-all step (novel
  * term arriving while k counters are live) is a single offset bump —
  * O(1) instead of rebuilding a k-entry map per over-k insert. A
  * histogram of live raw values reports how many counters each bump
  * kills without scanning; dead entries are physically purged only when
  * the map doubles past k, which amortizes to O(1) per insert (growing
  * from k to 2k entries takes k inserts, the purge costs O(2k)).
  */
final class MGBuffer extends Serializable {
  val counts = mutable.HashMap.empty[String, Long] // term -> raw count
  val hist = mutable.HashMap.empty[Long, Int] // live raw value -> #terms
  var offset = 0L
  var live = 0 // #terms with raw > offset

  private def histAdd(v: Long): Unit =
    hist.update(v, hist.getOrElse(v, 0) + 1)

  private def histDrop(v: Long): Unit = {
    val n = hist(v)
    if (n <= 1) hist.remove(v) else hist.update(v, n - 1)
  }

  /** One MG insert, keeping at most k live counters. */
  def add(term: String, k: Int): Unit = {
    val raw = counts.getOrElse(term, 0L)
    if (raw > offset) { // live term: plain increment
      histDrop(raw); histAdd(raw + 1)
      counts.update(term, raw + 1)
    } else if (live < k) { // novel term (or a dead entry re-entering)
      counts.update(term, offset + 1)
      histAdd(offset + 1)
      live += 1
      if (counts.size > 2 * k) purge()
    } else { // full: decrement-all == one offset bump, O(1)
      offset += 1
      // every live counter at the new offset just hit effective 0
      hist.remove(offset).foreach(live -= _)
    }
  }

  /** Drop physically-present dead entries (raw <= offset). The hist only
    * ever holds live values, so it needs no cleanup here. */
  def purge(): Unit =
    counts.filterInPlace { case (_, raw) => raw > offset }

  /** The live counters at their effective (guarantee-bearing) counts. */
  def effective: Map[String, Long] =
    counts.iterator.collect {
      case (t, raw) if raw > offset => t -> (raw - offset)
    }.toMap
}

object MGBuffer {
  /** Buffer holding exactly the given effective counts (offset 0). */
  def of(m: mutable.HashMap[String, Long]): MGBuffer = {
    val b = new MGBuffer
    m.foreach { case (t, c) =>
      b.counts.update(t, c)
      b.hist.update(c, b.hist.getOrElse(c, 0) + 1)
    }
    b.live = m.size
    b
  }
}

/** Misra–Gries heavy-hitters sketch over a string stream: at most `k`
  * live counters per aggregation buffer, mergeable, with the classic
  * guarantee that any term with true frequency > n/(k+1) IS in the
  * summary and every reported count undercounts its true count by at
  * most n/(k+1).
  *
  * Why it matters at 100 TB: exact top-terms (q33) shuffles the entire
  * term universe; this keeps O(k) state per partition, merges
  * associatively up the tree, and never shuffles more than k counters
  * per partial — the right shape when the vocabulary is billions of
  * terms and only the head matters. Candidates are verified/re-counted
  * exactly in a second cheap pass restricted to the k candidates when
  * exact head counts are needed. The buffer is a mutable [[MGBuffer]]
  * (TypedImperativeAggregate keeps it as a live object per group;
  * serialization only happens at partial-output boundaries), so the
  * per-row update path allocates nothing.
  *
  * The summary content (and its counts) depends on partition order —
  * this is inherent to MG, so the op is property-tested (guarantee
  * bounds) rather than hash-oracled, like the HLL sketch.
  */
class MisraGries(k: Int)
    extends Aggregator[String, MGBuffer, Map[String, Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: MGBuffer = new MGBuffer

  override def reduce(b: MGBuffer, term: String): MGBuffer = {
    b.add(term, k); b
  }

  /** Sum the effective counts, then if more than k terms survive,
    * subtract the (k+1)-th largest count from all (the standard
    * mergeable-MG step — equivalent to that many decrement-alls) and
    * drop non-positives. Runs once per partial, not per row, so the
    * O(k log k) select is immaterial. */
  override def merge(x: MGBuffer, y: MGBuffer): MGBuffer = {
    val u = mutable.HashMap.empty[String, Long]
    x.effective.foreach { case (t, c) => u.update(t, u.getOrElse(t, 0L) + c) }
    y.effective.foreach { case (t, c) => u.update(t, u.getOrElse(t, 0L) + c) }
    if (u.size > k) {
      val kth = u.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      u.filterInPlace { case (_, c) => c > kth }
      u.mapValuesInPlace { case (_, c) => c - kth }
    }
    MGBuffer.of(u)
  }

  override def finish(b: MGBuffer): Map[String, Long] = b.effective

  override def bufferEncoder: Encoder[MGBuffer] = Encoders.kryo[MGBuffer]
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
