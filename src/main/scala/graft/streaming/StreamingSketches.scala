package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch aggregations over unbounded streams — the state-bounded
  * summaries that replace exact global aggregates when the stream never
  * ends. An exact top-terms over a stream needs state proportional to
  * the vocabulary; the Misra–Gries sketch holds at most k counters NO
  * MATTER how long the stream runs, and its merge is associative, so
  * Spark maintains it incrementally across micro-batches like any
  * other aggregation buffer. Same guarantee as batch q74: any term
  * with true frequency > n/(k+1) is in the summary, counts undercount
  * by at most n/(k+1) — candidates for an exact re-count pass, not
  * final tallies.
  */
object StreamingSketches {

  /** (term, est) heavy-hitter candidates over a streaming documents
    * frame (needs a `text` column). Run in complete/update output mode
    * — it is a global aggregation with O(k) state. */
  def heavyHitterCandidates(docs: DataFrame, k: Int = 50): DataFrame = {
    val mg = udaf(new graft.functions.MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    docs
      .select(explode(expr(graft.queries.Dedup.TokExpr)).as("term"))
      .agg(mg(col("term")).as("sketch"))
      .select(explode(col("sketch")).as(Seq("term", "est")))
  }
}
