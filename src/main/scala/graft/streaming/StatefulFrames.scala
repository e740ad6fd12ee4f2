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
  * either (they version instead). Per-batch frame evaluation is the
  * same monotone two-cursor sweep over the sorted history+batch
  * timeline that the batch Window operator runs per partition — O(n)
  * amortized per batch, prefix sums for the frame aggregates.
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
    val all = (hist ++ batch.map(b => (b._1, b._3))).sortBy(_._1).toArray
    // prefix sums over the sorted timeline; every frame [ts − h, ts] is
    // then two monotone cursors (batch rows arrive ts-ascending, so
    // each cursor only ever moves forward — O(n) amortized per batch,
    // the streaming-frame sweep batch q136's Window operator runs
    // per partition)
    val n = all.length
    val psum = new Array[Long](n + 1)
    var i = 0
    while (i < n) { psum(i + 1) = psum(i) + all(i)._2; i += 1 }
    var hi = 0      // first index with t >  ts   (exclusive frame end)
    var lo7 = 0     // first index with t >= ts − H7
    var lo30 = 0; var lo1 = 0
    val out = batch.map { case (ts, eid, _) =>
      // value-inclusive RANGE frame [ts − h, ts]; t == ts rows are
      // PEERS and enter the frame regardless of arrival order
      while (hi < n && all(hi)._1 <= ts) hi += 1
      while (lo7 < n && all(lo7)._1 < ts - H7) lo7 += 1
      while (lo30 < n && all(lo30)._1 < ts - H30) lo30 += 1
      while (lo1 < n && all(lo1)._1 < ts - H1) lo1 += 1
      val s7 = psum(hi) - psum(lo7)
      val n30 = (hi - lo30).toLong
      val s1 = psum(hi) - psum(lo1)
      val n1 = (hi - lo1).toLong // >= 1: the row itself is in its frame
      (key, eid, ts, s7, n30, s1 * 100 / n1)
    }
    // evict everything older than the longest horizon behind the
    // newest event — the O(horizon)-state invariant. Strictly-older
    // only: a ts == newest − 7d row is still inside a newest-peer's
    // inclusive frame. Write cost: the full-buffer rewrite happens
    // ONLY when the filter actually drops entries; the steady state
    // (dense history, small batch, nothing aging out this batch)
    // appends just the arriving rows — O(batch) state I/O, not
    // O(horizon) per batch. Store order is append order, not ts
    // order — correctness doesn't care, the next batch re-sorts.
    val newest = all.last._1
    val cut = newest - H7
    if (all.head._1 < cut) buf.put(all.filter(_._1 >= cut))
    else buf.appendList(batch.map(b => (b._1, b._3)).toArray)
    out.iterator
  }
}

object StatefulFrames {

  /** The q136 quantization, shared verbatim with the batch query so
    * parity is by construction: exact integer cents from the
    * DECIMAL(18,2) cast, null values excluded. */
  private[graft] def quantized(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull && col("ts").isNotNull
        && col("user_id").isNotNull && col("event_id").isNotNull)
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
