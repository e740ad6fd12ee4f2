package graft.streaming

import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

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
  * Cross-batch out-of-order semantics: a late event INSIDE the open
  * session's merge window [start - gap, last + gap] merges exactly
  * (extending the start downward when earlier than it); a late event
  * OLDER than start - gap cannot belong to the open session and is
  * emitted immediately as its own session — an approximation (two such
  * stragglers that would have merged are emitted separately; exact
  * handling needs a session list per key). Pipelines needing exact
  * late-merge semantics use the built-in session_window path
  * (StreamingWindows.session), which q31-parity covers.
  *
  * Scale: state is O(users), partitioned by the group key; timeouts are
  * driven by the event-time watermark, so state cannot grow unboundedly.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, sstart: String, n_events: Long,
      dur_us: Long)

  private val fmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").withZone(ZoneOffset.UTC)

  private def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def close(userId: Long, s: OpenSession): SessionOut =
    SessionOut(userId,
      fmt.format(java.time.Instant.ofEpochSecond(
        s.startUs / 1000000L, (s.startUs % 1000000L) * 1000L)),
      s.n, s.lastUs - s.startUs)

  def sessionFn(gapUs: Long)(userId: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(userId, _)).iterator
      state.remove()
      return out
    }
    val out = scala.collection.mutable.Buffer[SessionOut]()
    var cur = state.getOption
    // micro-batch delivery order is not time order — sort within batch
    events.toSeq.map(micros _ compose (_.ts)).sorted.foreach { t =>
      cur match {
        case None => cur = Some(OpenSession(t, t, 1))
        case Some(s) =>
          if (t - s.lastUs > gapUs) { // next session begins
            out += close(userId, s)
            cur = Some(OpenSession(t, t, 1))
          } else if (s.startUs - t > gapUs) { // straggler before the
            // session's merge window: emit standalone (see scaladoc)
            out += close(userId, OpenSession(t, t, 1))
          } else cur = Some(OpenSession(math.min(s.startUs, t),
            math.max(s.lastUs, t), s.n + 1))
      }
    }
    cur.foreach { s =>
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
      .withWatermark("ts", watermark)
      .dropDuplicates("user_id", "ts")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        sessionFn(gapMinutes * 60L * 1000000L))
  }
}
