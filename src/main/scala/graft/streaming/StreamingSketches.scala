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

  /** Per-key quantile monitoring on the wire: the mergeable
    * relative-error sketch (graft.functions.QuantileSketch — the batch
    * q56 aggregate) maintained incrementally across micro-batches.
    * O(log(max/min)/gamma) bucket counters per key NO MATTER how long
    * the stream runs, and because the sketch's merge is a
    * deterministic bin-count sum, the streamed result equals the batch
    * sketch over the same rows EXACTLY — not merely within tolerance
    * (parity pinned in StreamingSpec). Run in complete/update mode;
    * emits one estimate column per requested quantile, named from the
    * FULL quantile value (p50, p99_5 — rounding to whole percents
    * collided 0.995 with 1.0 and silently dropped an estimate, the
    * r14 ADVICE finding; NULL metric values are skipped via the boxed
    * input encoder). Duplicate quantiles are rejected up front. */
  def quantileMonitor(rows: DataFrame, keyCol: String, valCol: String,
      gamma: Double = 0.01,
      quantiles: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    val names = quantiles.map(quantileColName)
    require(names.distinct == names,
      s"duplicate quantiles requested: $quantiles")
    val qs = udaf(new graft.functions.QuantileSketch(gamma, quantiles),
      org.apache.spark.sql.Encoders.DOUBLE)
    val est = rows
      .groupBy(col(keyCol))
      .agg(qs(col(valCol)).as("qq"))
    names.zipWithIndex.foldLeft(est) { case (df, (n, i)) =>
      df.withColumn(n, element_at(col("qq"), i + 1))
    }.drop("qq")
  }

  /** Lossless quantile -> column name: percent from the shortest
    * decimal repr (never binary-double residue — 0.9 * 100 is
    * 90.00000000000001 in doubles), '.' -> '_' for SQL-identifier
    * safety. 0.5 -> p50, 0.995 -> p99_5, 0.5499 -> p54_99. */
  private[graft] def quantileColName(q: Double): String = {
    val pct = (BigDecimal(q.toString) * 100)
      .underlying.stripTrailingZeros.toPlainString
    s"p${pct.replace(".", "_").replace("-", "m")}"
  }
}
