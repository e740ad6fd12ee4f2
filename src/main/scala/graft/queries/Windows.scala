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
      val w1 = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val w2 = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
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
        .orderBy(col("o_orderdate"), col("o_orderkey"))
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
      val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
      Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q19_analytic_windows" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
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
             ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           ntile(4) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) AS tile,
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
