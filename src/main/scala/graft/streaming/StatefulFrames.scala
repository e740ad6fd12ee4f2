package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming twin of batch q136's interval RANGE frames — the
  * online/offline FEATURE PARITY problem: a feature store must serve,
  * per arriving event, the same trailing time-valued aggregates
  * ("sum over the last 7 days", "count over the last 30 minutes")
  * that the offline batch backfill computes with RANGE window frames,
  * or training/serving skew corrupts every model downstream. This
  * processor maintains one bounded per-user buffer (ListState in the
  * RocksDB store) holding only the events inside the LONGEST horizon
  * (7 days of that user's activity — the eviction at the end of each
  * batch is what makes state O(horizon), not O(stream)), and emits,
  * for every arriving event, exactly the q136 row: value-inclusive
  * [ts − h, ts] frames where equal-ts peers are in each other's
  * frames, exact integer cents, and the floored scaled-integer 1-day
  * mean.
  *
  * Parity contract (StreamingSpec): byte-identical to batch q136 under
  * in-order arrival where equal-(user, ts) peers share a micro-batch —
  * the same caveat as [[TransitionProcessor]]; a late event would need
  * retraction of already-served features, which no online store does
  * either (they version instead). Per-batch frame evaluation walks the
  * merged history+batch timeline per emitted row (fine at test scale;
  * a production processor two-pointers the sorted run).
  */
class TrailingFrameProcessor extends StatefulProcessor[
    Long, (Long, Long, Long, Long), (Long, Long, Long, Long, Long, Long)] {
  // in: (user_id, ts_us, event_id, cents)
  // out: (user_id, event_id, ts_us, sum_7d_c, n_30m, avg_1d_e4)
  @transient private var buf: ListState[(Long, Long)] = _ // (ts_us, cents)

  private val H7 = 7L * 24 * 3600 * 1000000L
  private val H30 = 30L * 60 * 1000000L
  private val H1 = 24L * 3600 * 1000000L

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[(Long, Long)]("horizon7d",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long, Long)] = {
    val batch = rows.map(r => (r._2, r._3, r._4)).toSeq
      .sortBy(x => (x._1, x._2)) // (ts_us, event_id, cents)
    if (batch.isEmpty) return Iterator.empty
    val hist = {
      val it = buf.get()
      val b = Seq.newBuilder[(Long, Long)]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val all = (hist ++ batch.map(b => (b._1, b._3))).sortBy(_._1)
    val out = batch.map { case (ts, eid, _) =>
      var s7 = 0L; var n30 = 0L; var s1 = 0L; var n1 = 0L
      all.foreach { case (t, c) =>
        // value-inclusive RANGE frame [ts − h, ts]; t == ts rows are
        // PEERS and enter the frame regardless of arrival order
        if (t <= ts) {
          if (t >= ts - H7) s7 += c
          if (t >= ts - H30) n30 += 1
          if (t >= ts - H1) { s1 += c; n1 += 1 }
        }
      }
      (key, eid, ts, s7, n30, s1 * 100 / n1) // n1 >= 1: own row in frame
    }
    // evict everything older than the longest horizon behind the
    // newest event — the O(horizon)-state invariant. Strictly-older
    // only: a ts == newest − 7d row is still inside a newest-peer's
    // inclusive frame.
    val newest = all.last._1
    buf.put(all.filter(_._1 >= newest - H7).toArray)
    out.iterator
  }
}

object StatefulFrames {

  /** The q136 quantization, shared verbatim with the batch query so
    * parity is by construction: exact integer cents from the
    * DECIMAL(18,2) cast, null values excluded. */
  private[graft] def quantized(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) AS cents")

  /** Per-event trailing interval frames over a streaming events frame
    * (append mode — every event's features emitted exactly once).
    * Output columns match batch q136 one-for-one apart from the
    * presentation timestamp string. */
  def trailingFrames(spark: SparkSession,
      events: DataFrame): Dataset[(Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    quantized(events)
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new TrailingFrameProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
