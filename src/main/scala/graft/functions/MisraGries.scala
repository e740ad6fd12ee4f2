package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch over a string stream: at most `k`
  * counters per aggregation buffer, mergeable, with the classic
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
  * exact head counts are needed.
  *
  * The summary content (and its counts) depends on partition order —
  * this is inherent to MG, so the op is property-tested (guarantee
  * bounds) rather than hash-oracled, like the HLL sketch.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], term: String): Map[String, Long] =
    b.get(term) match {
      case Some(c) => b.updated(term, c + 1)
      case None if b.size < k => b.updated(term, 1L)
      case None => // decrement-all step: drop zeroed counters
        b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  /** Union the counters, then if more than k survive, subtract the
    * (k+1)-th largest count from all (the standard mergeable-MG step —
    * equivalent to that many decrement-alls) and drop non-positives. */
  override def merge(x: Map[String, Long],
      y: Map[String, Long]): Map[String, Long] = {
    val u = y.foldLeft(x) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (u.size <= k) u
    else {
      val kth = u.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      u.flatMap { case (t, c) =>
        if (c > kth) Some(t -> (c - kth)) else None
      }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
