package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Event-time analytics in batch mode (SURVEY.md §2-B q29–q31): tumbling,
  * sliding, and session windows over the `events` table. The streaming
  * variants (Structured Streaming + watermark) live in
  * graft.streaming.StreamingWindows and are parity-tested against these.
  *
  * Oracle notes: window starts are pinned via epoch arithmetic (not
  * engine-specific helpers); Spark's session_window merges an event at
  * exactly prev + gap into the running session (verified in
  * OperatorSpec), so the islands oracle opens a new session only when
  * the gap is STRICTLY greater than 30 minutes.
  * Timestamps leave either as SECOND-grain formatted strings (hour
  * windows — no sub-second formatter involved) or as epoch-microsecond
  * BIGINTs (session starts), so neither parquet/DuckDB timestamp
  * encodings nor engine-version '%f' fractional formatting (the q136
  * round-9 hazard class) can skew the compare.
  */
object EventTime {
  type Q = (SparkSession, String) => DataFrame
  private val fmtS = "yyyy-MM-dd HH:mm:ss"

  /** q29 aggregation over any events frame (batch or streaming).
    *
    * NULL-domain pin (shared by every aggregator here, batch AND
    * streaming sides): Spark's window()/session_window() silently DROP
    * a NULL-ts row (the TimeWindowing rules inject an is-not-null time
    * filter) while a SQL GROUP BY keeps it under a NULL key — so the
    * exclusion is made EXPLICIT on both engines (`ts IS NOT NULL` here
    * and in every oracle's FROM), pinning the domain the way q132 pins
    * its value domain. The fixtures carry no NULLs today; the pin is
    * against a future regeneration quietly introducing one. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_v"))
      .select(date_format(col("window.start"), fmtS).as("wstart"),
        col("event_type"), col("n"), col("sum_v"))

  /** q30 aggregation. The mean is emitted as a floored integer scaled by
    * 1e4: sum/count of 2-decimal values can land exactly on a round-half
    * tie (e.g. 591.31/8), where Spark's HALF_UP and DuckDB's binary
    * rounding disagree — integer arithmetic is tie-free in both engines. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .as("sdec"))
      .select(date_format(col("window.start"), fmtS).as("wstart"),
        col("n"),
        expr("(cast(sdec * 100 as bigint) * 100) div n").as("avg_e4"))

  /** The ONE 30-minute sessionizer grouping — null-ts pinned, gap
    * 30 min — shared by q31/sessionAgg (and through it the streaming
    * twin) and q130's gauge, so a gap or null-pin change cannot
    * sessionize the two queries differently while their oracles stay
    * mirrored. Boundary semantics (pinned empirically by
    * OperatorSpec's "exactly-30-min gap stays in the same session"
    * case): Spark's session merge runs on window OVERLAP-OR-TOUCH, so
    * an event at exactly `prev + gap` MERGES into the running session;
    * only a STRICTLY larger gap opens a new one. The q31/q130
    * gaps-and-islands oracles mirror this with
    * `ts - lag(ts) > INTERVAL 30 MINUTE` (strict `>`, not `>=`). */
  private def sessionGroups(events: DataFrame) =
    events
      .filter(col("ts").isNotNull)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))

  /** q31 aggregation; input must already be deduped on (user_id, ts) so
    * session semantics match the gaps-and-islands oracle. The session
    * start leaves as epoch-microsecond BIGINT (r11 hardening, same
    * treatment as q136/q63/q90: '%f' fractional formatting was the
    * construct class behind the round-9 driver hash miss, so no
    * sub-second presentation string may sit on a hashed surface).
    * session_window.start IS the session's min(ts), which is what the
    * gaps-and-islands oracle emits. */
  def sessionAgg(events: DataFrame): DataFrame =
    sessionGroups(events)
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("dur_us"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sstart_us"),
        col("n_events"), col("dur_us"))

  val queries: Map[String, Q] = Map(
    // q29: tumbling 1-hour event-time window x event_type
    "q29_tumbling_window" -> ((s, d) =>
      tumblingAgg(Tables.load(s, d, "events"))
        // nulls-last pins the NULL-event_type group's placement to
        // DuckDB's ORDER BY default (Spark ascending is NULLS FIRST)
        .orderBy(col("wstart"), col("event_type").asc_nulls_last)),

    // q30: sliding 1-hour window, 15-minute slide
    "q30_sliding_window" -> ((s, d) =>
      slidingAgg(Tables.load(s, d, "events")).orderBy("wstart")),

    // q31: session window, 30-minute gap, per user
    "q31_session_window" -> ((s, d) =>
      sessionAgg(Tables.load(s, d, "events")
        .select("user_id", "ts").distinct())
        // nulls-last pin on the nullable sort key (suite convention:
        // Spark asc = NULLS FIRST, DuckDB = NULLS LAST)
        .orderBy(col("user_id").asc_nulls_last, col("sstart_us"))),

    // q130: concurrency gauge — the interval -> step-function operator
    // none of the fixed windows cover (sessions SPAN hour boundaries):
    // how many user sessions are simultaneously live, as a compressed
    // change-point series. Sessions (the q31 sessionizer) become
    // minute-grain +1/-1 boundary deltas; the running sum over the
    // delta table is the live-session gauge at each change point. The
    // only global window runs over the PER-MINUTE aggregated deltas —
    // a TIME-DOMAIN-bounded table (minutes in the corpus's time range,
    // ~525k/year, independent of corpus size — the q88 argument), never
    // over sessions. Everything else is the per-user session aggregate
    // plus one tiny shuffle on the minute key; all integers, tie-free.
    "q130_concurrency_gauge" -> ((s, d) => {
      val sess = sessionGroups(Tables.load(s, d, "events")
          .select("user_id", "ts").distinct())
        .agg(expr("unix_micros(min(ts)) div 60000000").as("m0"),
          expr("unix_micros(max(ts)) div 60000000").as("m1"))
      // both boundary deltas explode out of ONE pass over a single
      // sessionization — the union-with-itself form planned the
      // session aggregate twice (ReuseExchange dedupes the shuffle but
      // the sort/merge session aggregation itself still ran per branch)
      val deltas = sess.select(explode(array(
          struct(col("m0").as("m"), lit(1L).as("d")),
          struct((col("m1") + 1).as("m"), lit(-1L).as("d")))).as("b"))
        .select(col("b.m").as("m"), col("b.d").as("d"))
        .groupBy("m").agg(sum("d").as("delta"))
      deltas.withColumn("concurrent",
          sum(col("delta")).over(org.apache.spark.sql.expressions.Window
            .orderBy("m")
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
        .select(col("m"), col("delta"), col("concurrent"))
        .orderBy("m")
    })
  )

  import Det.sqlDsum

  val oracle: Map[String, String] = Map(
    "q29_tumbling_window" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
            event_type, count(*) AS n, ${sqlDsum("value")} AS sum_v
          FROM events WHERE ts IS NOT NULL
          GROUP BY 1, 2 ORDER BY wstart, event_type""",

    // each event belongs to 4 sliding windows: starts floor(t/900)*900 - i*900
    "q30_sliding_window" ->
      s"""SELECT strftime(make_timestamp(
              ((CAST(floor(epoch(ts) / 900) AS BIGINT) - i.i) * 900) * 1000000),
              '%Y-%m-%d %H:%M:%S') AS wstart,
            count(*) AS n,
            (CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) * 100)
              // count(*) AS avg_e4
          FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i)
          WHERE ts IS NOT NULL
          GROUP BY 1 ORDER BY wstart""",

    "q31_session_window" ->
      """WITH e AS (SELECT DISTINCT user_id, ts FROM events
                WHERE ts IS NOT NULL),
         f AS (SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS newsess
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         g AS (SELECT user_id, ts,
                 sum(newsess) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
               FROM f)
         SELECT user_id,
           epoch_us(min(ts)) AS sstart_us,
           count(*) AS n_events,
           date_diff('microseconds', min(ts), max(ts)) AS dur_us
         FROM g GROUP BY user_id, sid ORDER BY user_id, sstart_us""",

    // the same gaps-and-islands sessions, folded to minute-grain
    // boundary deltas and a running sum — all integer arithmetic
    "q130_concurrency_gauge" ->
      """WITH e AS (SELECT DISTINCT user_id, ts FROM events
                WHERE ts IS NOT NULL),
         f AS (SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS newsess
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         g AS (SELECT user_id, ts,
                 sum(newsess) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
               FROM f),
         s AS (SELECT epoch_us(min(ts)) // 60000000 AS m0,
                 epoch_us(max(ts)) // 60000000 AS m1
               FROM g GROUP BY user_id, sid),
         d0 AS (SELECT m0 AS m, 1 AS d FROM s
                UNION ALL SELECT m1 + 1, -1 FROM s),
         dd AS (SELECT m, CAST(sum(d) AS BIGINT) AS delta
                FROM d0 GROUP BY m)
         SELECT m, delta,
           CAST(sum(delta) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS concurrent
         FROM dd ORDER BY m"""
  )
}
