package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp

/** As-of join semantics on hand-computed fixtures. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:00:05"), 101.0),
    (1L, ts("2024-01-01 10:01:00"), 102.0),
    (2L, ts("2024-01-01 10:00:30"), 50.0)
  ).toDF("qk", "qts", "price")
    .withColumnRenamed("qk", "k")

  private val trades = Seq(
    (1L, ts("2024-01-01 10:00:03"), 10),   // -> 100.0 (10:00:00)
    (1L, ts("2024-01-01 10:00:05"), 20),   // -> 101.0 (same instant)
    (1L, ts("2024-01-01 10:02:00"), 30),   // -> 102.0 (10:01:00)
    (2L, ts("2024-01-01 10:00:00"), 40),   // -> no quote yet (null)
    (3L, ts("2024-01-01 10:00:00"), 50)    // -> key never quoted (null)
  ).toDF("tk", "tts", "qty")
    .withColumnRenamed("tk", "k")

  test("as-of join picks the latest quote at or before the trade") {
    val out = AsOfJoin.asofJoin(trades, quotes, "k", "tts", "qts")
      .select("k", "qty", "price").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(out == Set(
      (1L, 10, Some(100.0)),
      (1L, 20, Some(101.0)),
      (1L, 30, Some(102.0)),
      (2L, 40, None),
      (3L, 50, None)))
  }

  test("tolerance drops matches older than the bound") {
    val out = AsOfJoin.asofJoin(trades, quotes, "k", "tts", "qts",
      toleranceMs = Some(10000L))  // 10s
      .select("k", "qty", "price").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    // trade at 10:02:00 is 60s after the 10:01:00 quote -> dropped
    assert(out == Set(
      (1L, 10, Some(100.0)),
      (1L, 20, Some(101.0)),
      (1L, 30, None),
      (2L, 40, None),
      (3L, 50, None)))
  }

  test("every left row survives (left-outer semantics)") {
    assert(AsOfJoin.asofJoin(trades, quotes, "k", "tts", "qts")
      .count() == trades.count())
  }
}
