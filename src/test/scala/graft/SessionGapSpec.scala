package graft

import org.apache.spark.sql.functions._

/** Pins Spark's session_window exact-gap boundary semantics — the
  * q31/q130 oracles' gaps-and-islands predicate must match them
  * EXACTLY, and the two candidate predicates (`>` vs `>=` the gap)
  * differ precisely on an event arriving at lastEvent + gap.
  *
  * Measured (this suite, Spark 4.1): an event at EXACTLY
  * lastEvent + gap MERGES into the running session — the window end
  * `last + gap` is inclusive for the next arrival, so only a STRICTLY
  * larger gap opens a new session. The oracles' island predicate
  * `ts - lag(ts) > INTERVAL 30 MINUTE` (strict) is therefore the
  * correct mirror, exactly as the EventTime scaladoc documents. A
  * round-9 external review claimed the opposite (half-open window,
  * exact gap splits); this pin settles it empirically and will fail
  * loudly if a future Spark version changes the boundary rule. */
class SessionGapSpec extends SparkSpec {
  import spark.implicits._

  test("session_window merges an event at EXACTLY lastEvent + gap") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:30:00")), // == gap
      (2L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 10:30:01")) // > gap
    ).toDF("user_id", "ts")
    val n = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count().groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(1L) == 1L,
      s"exact-gap arrival no longer merges — oracles' strict '>' island " +
        s"predicate would now diverge from session_window: $n")
    assert(n(2L) == 2L,
      s"a strictly-larger gap must open a new session: $n")
  }
}
