package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Window functions (SURVEY.md §2-B q18–q19): ranking and analytic
  * windows with frames. rank/dense_rank are computed over a coarse key
  * (o_orderstatus) so tie groups are real; their values depend only on
  * peer-group membership, so they stay deterministic. row_number/ntile use
  * a total per-partition ordering. Frame sums cast to DECIMAL first so the
  * running totals are bit-identical to the sequential oracle.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q18_rank_windows" -> ((s, d) => {
      // null-placement convention (whole suite): NULLS LAST on every
      // nullable sort key, stated on whichever engine doesn't default
      // to it — Spark ascending is NULLS FIRST (so asc_nulls_last
      // here), Spark descending already NULLS LAST (so the oracle says
      // DESC NULLS LAST, DuckDB's DESC default being NULLS FIRST).
      // Fixtures carry no NULLs today; this pins placement against a
      // future regeneration.
      val w1 = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val w2 = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderstatus").asc_nulls_last)
      Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w1).cast("long").as("rn"),
          ntile(4).over(w1).cast("long").as("tile"),
          rank().over(w2).cast("long").as("rnk"),
          dense_rank().over(w2).cast("long").as("drnk"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // q19f: value windows — first/last/nth over an explicit frame
    "q19_value_windows" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc_nulls_last, col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(full).as("first_price"),
          last(col("o_totalprice")).over(full).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // q79: distribution windows — percent_rank / cume_dist. Both are
    // integer-ratio doubles ((rank-1)/(n-1), peers/n), so the same
    // integer inputs give bit-identical IEEE results in both engines;
    // ties contribute identical values regardless of intra-tie order.
    "q79_dist_windows" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").asc_nulls_last)
      Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // q136: RANGE/interval window frames — value-based trailing frames
    // ("sum over the last 7 DAYS", not 7 ROWS), the everyday analytics
    // frame the rest of the suite's rowsBetween windows don't cover.
    // All three frames share ONE window ordering (partition user_id,
    // order ts), so Catalyst plans a single Window operator = a single
    // shuffle + sort, same scale shape as q18 (PlanSpec pins this).
    // RANGE frame boundaries are value-inclusive ([ts − 7d, ts]) and
    // peer rows (equal ts) enter the frame together in both engines, so
    // the results are tie-safe and deterministic; sums go through
    // DECIMAL (Det policy) so partial-agg order can't flip a bit.
    // Everything reports in exact integer units (cents / e4 basis
    // points): a rounded double trailing average diverged from the
    // oracle by one ulp-flip at a .00005 boundary on the fixture, so
    // the division is exact integer arithmetic instead. Spark's `div`
    // and DuckDB's integer `//` BOTH truncate toward zero (measured:
    // -500 // 3 = -166 in DuckDB, same as div), so the quotient agrees
    // on the full BIGINT domain, negative sums included.
    "q136_range_frames" -> ((s, d) =>
      Tables.load(s, d, "events")
        // both domains pinned explicitly (mirrored in the oracle's
        // WHERE): NULL value would diverge on window null ordering,
        // NULL ts would land at opposite ends of the partition AND the
        // output sort (Spark asc NULLS FIRST vs DuckDB NULLS LAST)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .withColumn("cents",
          expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
        .selectExpr(
          "event_id", "user_id",
          "date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS tss",
          """sum(cents) over (
               partition by user_id order by ts
               range between interval 7 days preceding and current row)
             AS sum_7d_c""",
          """count(*) over (
               partition by user_id order by ts
               range between interval 30 minutes preceding and current row)
             AS n_30m""",
          """(sum(cents) over (
               partition by user_id order by ts
               range between interval 1 day preceding and current row)
             * 100) div count(*) over (
               partition by user_id order by ts
               range between interval 1 day preceding and current row)
             AS avg_1d_e4""")
        // nulls-last pin on the nullable sort keys (ts is filtered
        // non-null above, so tss is safe; user_id/event_id are not)
        .orderBy(col("user_id").asc_nulls_last, col("tss"),
          col("event_id").asc_nulls_last)),

    "q19_analytic_windows" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc_nulls_last, col("o_orderkey"))
      val dec = col("o_totalprice").cast(DecimalType(18, 2))
      Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          sum(dec).over(w.rowsBetween(-2, 0)).cast("double").as("mov3"),
          sum(dec).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("run_total"))
        .orderBy("o_custkey", "o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q18_rank_windows" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC NULLS LAST, o_orderkey) AS rn,
           ntile(4) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC NULLS LAST, o_orderkey) AS tile,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS drnk
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "q19_value_windows" ->
      """SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",

    "q79_dist_windows" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
         ORDER BY o_custkey, o_orderkey""",

    "q136_range_frames" ->
      """WITH ev AS (SELECT event_id, user_id, ts,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
            FROM events WHERE value IS NOT NULL AND ts IS NOT NULL)
         SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS tss,
           sum(cents) OVER
             (w RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
             AS sum_7d_c,
           count(*) OVER
             (w RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW)
             AS n_30m,
           (sum(cents) OVER
             (w RANGE BETWEEN INTERVAL 1 DAYS PRECEDING AND CURRENT ROW)
             * 100) // count(*) OVER
             (w RANGE BETWEEN INTERVAL 1 DAYS PRECEDING AND CURRENT ROW)
             AS avg_1d_e4
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         ORDER BY user_id, tss, event_id""",

    "q19_analytic_windows" ->
      """SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS od,
           lag(o_totalprice, 1) OVER w AS prev_price,
           lead(o_totalprice, 1) OVER w AS next_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey"""
  )
}
