package graft

import java.sql.Timestamp

import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.functions._

/** The native sort-merge as-of operator (graft.plans.AsOfJoinExec):
  * fixture semantics, equality with the window-composed operators.AsOfJoin
  * on real data, partitioning invariance, and the physical plan shape
  * (AsOfJoinExec present, no Window, sort+exchange per side).
  */
class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:00:05"), 101.0),
    (1L, ts("2024-01-01 10:01:00"), 102.0),
    (2L, ts("2024-01-01 10:00:30"), 50.0)
  ).toDF("qk", "qts", "price")

  private val trades = Seq(
    (1L, ts("2024-01-01 10:00:03"), 10),   // -> 100.0 (10:00:00)
    (1L, ts("2024-01-01 10:00:05"), 20),   // -> 101.0 (same instant)
    (1L, ts("2024-01-01 10:02:00"), 30),   // -> 102.0 (10:01:00)
    (2L, ts("2024-01-01 10:00:00"), 40),   // -> no quote yet (null)
    (3L, ts("2024-01-01 10:00:00"), 50)    // -> key never quoted (null)
  ).toDF("k", "tts", "qty")

  private def fixtureOut = AsOfJoinPlan
    .asof(trades, quotes, "k", "qk", "tts", "qts")
    .select("k", "qty", "price").collect()
    .map(r => (r.getLong(0), r.getInt(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

  private val expected = Set(
    (1L, 10, Some(100.0)),
    (1L, 20, Some(101.0)),
    (1L, 30, Some(102.0)),
    (2L, 40, None),
    (3L, 50, None))

  test("native as-of picks the latest quote at or before the trade") {
    assert(fixtureOut == expected)
  }

  test("null keys and null timestamps on the left emit unmatched") {
    val l = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:10")), 1),
      (None, Some(ts("2024-01-01 10:00:10")), 2),
      (Some(1L), None, 3)
    ).toDF("k", "tts", "id")
    val out = AsOfJoinPlan.asof(l, quotes, "k", "qk", "tts", "qts")
      .select("id", "price").collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(out == Set((1, Some(101.0)), (2, None), (3, None)))
  }

  test("result is invariant to input partitioning") {
    val repl = AsOfJoinPlan.asof(
      trades.repartition(7), quotes.repartition(3),
      "k", "qk", "tts", "qts")
      .select("k", "qty", "price").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(repl == expected)
  }

  test("native operator equals the window-composed as-of join on events") {
    val ev = Tables.load(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("su_id"), col("ts").as("s_ts"))
      .agg(count(lit(1)).as("s_cnt"))
    val native = AsOfJoinPlan
      .asof(purchases, signups, "user_id", "su_id", "p_ts", "s_ts")
      .select("user_id", "p_ts", "s_ts", "s_cnt").collect()
      .map(_.toSeq).toSet
    val composed = graft.operators.AsOfJoin
      .asofJoin(purchases,
        signups.withColumnRenamed("su_id", "user_id"),
        "user_id", "p_ts", "s_ts")
      .select("user_id", "p_ts", "s_ts", "s_cnt").collect()
      .map(_.toSeq).toSet
    assert(native == composed,
      s"native ${native.size} rows vs composed ${composed.size}")
  }

  test("plan: AsOfJoinExec, no Window, one exchange+sort per side") {
    val df = AsOfJoinPlan.asof(trades, quotes, "k", "qk", "tts", "qts")
    df.collect()
    val p = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }).toString
    assert(p.contains("AsOfJoin"), s"expected the native operator in:\n$p")
    assert(!p.contains("Window"), "native as-of must not plan a Window")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected one hash exchange per side in:\n$p")
  }

  test("the strategy is injected by GraftExtensions (no manual ensure)") {
    // SparkSpec sessions are built via GraftSession -> GraftExtensions;
    // planning an AsOfJoinNode must succeed even before AsOfJoinPlan.asof
    // has patched experimental strategies (fresh-session path).
    assert(spark.sessionState.planner.strategies
      .exists(_.getClass.getName.contains("AsOfJoinStrategy")) ||
      spark.experimental.extraStrategies
        .exists(_.getClass.getName.contains("AsOfJoinStrategy")),
      "AsOfJoinStrategy must be available session-wide")
  }
}
