package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via flatMapGroupsWithState — the
  * hand-rolled analog of session_window (q31) for cases the built-in
  * operator can't express (custom merge logic, per-session enrichments,
  * emit-on-close side outputs).
  *
  * State per user is one open session (start/last/count in micros); an
  * event-time timeout at last + gap closes and emits it. Sessions closed
  * *within* a batch are emitted immediately. Emission format matches the
  * batch q31 output exactly, so parity is assertable row-for-row.
  *
  * Cross-batch out-of-order semantics: within a batch, ALL events plus
  * the open state session are interval-merged together (standard
  * gap-merge over the time-sorted sequence), so same-batch stragglers
  * that belong together form one session and a straggler within gap of
  * the (possibly extended) open session merges into it exactly. Only the
  * LAST merged session stays open in state; earlier ones are emitted at
  * batch end. The remaining approximation is cross-batch only: a
  * straggler in a LATER batch cannot rejoin a session already emitted in
  * an earlier one (exact handling needs a bounded session list per key
  * held until the watermark passes). Pipelines needing exact late-merge
  * semantics use the built-in session_window path
  * (StreamingWindows.session), which q31-parity covers.
  *
  * Scale: state is O(users), partitioned by the group key; timeouts are
  * driven by the event-time watermark, so state cannot grow unboundedly.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  // sstart_us: epoch micros BIGINT, matching the batch q31 output (r11
  // hardening — sub-second presentation strings left every hashed and
  // parity-compared surface together; see EventTime.sessionAgg)
  case class SessionOut(user_id: Long, sstart_us: Long, n_events: Long,
      dur_us: Long)

  private def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def close(userId: Long, s: OpenSession): SessionOut =
    SessionOut(userId, s.startUs, s.n, s.lastUs - s.startUs)

  def sessionFn(gapUs: Long)(userId: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(userId, _)).iterator
      state.remove()
      return out
    }
    // Interval-merge the batch's events (sorted — micro-batch delivery
    // order is not time order) together with the open state session:
    // consecutive items <= gap apart coalesce. This makes same-batch
    // stragglers merge with EACH OTHER and with the open session even
    // when a later event first pulls the session's start down (the
    // one-pass version emitted them standalone — see scaladoc).
    val items = (events.toSeq.map { e =>
      val t = micros(e.ts); OpenSession(t, t, 1)
    } ++ state.getOption).sortBy(s => (s.startUs, s.lastUs))
    val merged = items.foldLeft(List.empty[OpenSession]) { (acc, s) =>
      acc match {
        case h :: t if s.startUs - h.lastUs <= gapUs =>
          OpenSession(h.startUs, math.max(h.lastUs, s.lastUs), h.n + s.n) :: t
        case _ => s :: acc
      }
    }.reverse
    // all but the time-wise last are > gap before a newer session and
    // close now; the last stays open awaiting its event-time timeout
    val out = merged.dropRight(1).map(close(userId, _))
    merged.lastOption.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
    }
    out.iterator
  }

  /** Watermarked streaming sessionization of an events frame. */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"))
      // nullable events schema: a NULL user_id kills the Ev encoder
      // and a NULL ts has no event-time to sessionize on (batch q31
      // groups them out of every session too)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .dropDuplicates("user_id", "ts")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        sessionFn(gapMinutes * 60L * 1000000L))
  }
}
