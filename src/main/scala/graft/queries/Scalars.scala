package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Det, Tables}

/** Scalar-function families (SURVEY.md §2-B q23–q28): string, date/time,
  * math/conditional, JSON, array (higher-order), and map functions. All
  * stay inside whole-stage codegen (built-in Catalyst expressions only).
  * Derived integer columns are cast to BIGINT on both sides so parquet
  * schemas line up with the DuckDB oracle.
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val queries: Map[String, Q] = Map(
    // q23: string functions
    "q23_string_fns" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("name5"),
        concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
        split(col("p_name"), " ").getItem(0).as("first_tok"),
        regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_tok"),
        regexp_replace(col("p_type"), "E", "X").as("rep"),
        trim(concat(lit("  "), col("p_name"), lit(" "))).as("trimmed"))
        .orderBy("p_partkey")),

    // q24: date/time functions
    "q24_date_fns" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("mon_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("dd"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"))
        .orderBy("o_orderkey")),

    // q25: math + conditional functions
    // widen (r15): the 11-expression math projection is evaluated
    // twice over the corpus (once by the orderBy's range-bounds
    // sampling pass, once for real), both on the single-row-group
    // scan's one task — measured 0.78 s + 1.29 s of the 2.5 s wall.
    // The spread parallelizes both passes; at scale it no-ops.
    "q25_math_cond" -> ((s, d) =>
      graft.operators.Parallelism
        .widen(t(s, d, "lineitem"), col("l_orderkey")).select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - 0.05), 4).as("abs_d"),
        // round() on sqrt: irrational for non-square inputs, so the
        // HALF_UP-vs-binary tie divergence between engines cannot trigger
        round(sqrt(col("l_extendedprice")), 3).as("r1"),
        floor(col("l_quantity")).cast("long").as("fl"),
        ceil(col("l_quantity")).cast("long").as("ce"),
        (col("l_linenumber") % 3).cast("long").as("m3"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
        when(col("l_quantity") > 25, "big").otherwise("small").as("sizecat"),
        coalesce(expr("nullif(l_returnflag, 'N')"), lit("X")).as("flag2"),
        greatest(col("l_tax"), col("l_discount")).as("gr"),
        least(col("l_tax"), col("l_discount")).as("le"))
        .orderBy("l_orderkey", "l_linenumber")),

    // q26: JSON functions (get_json_object + from_json on events.props).
    // The row domain is k > 50 ONLY — identical to the oracle's WHERE.
    // Parser agreement (from_json's typed k2 == get_json_object's k) is
    // its own OUTPUT column, n_typed, oracled as count(*): if the two
    // Spark parsers ever disagree on a kept row (e.g. a string-encoded
    // number, where the typed schema yields NULL), the compare fails on
    // a column NAMED for the claim instead of silently shrinking the
    // Spark-side domain and reading as an engine bug.
    "q26_json_fns" -> ((s, d) => {
      // NOT widened (r15 measurement): the spread exchange carries the
      // fat props JSON strings, and the single-task scan+shuffle-write
      // cost as much as the parse it parallelized (1.1 → 1.5 s) —
      // widen pays only when per-row work dwarfs the carried bytes
      val ev = t(s, d, "events")
      // k domain pinned to INTEGER-literal JSON strings before the
      // cast (mirrored in the oracle): a float-formatted k ('69.0',
      // '12.5') would throw under ANSI here while DuckDB's CAST
      // silently ROUNDS it ('12.5' -> 13, measured) — the regex is the
      // one construct both regex engines agree on byte-for-byte
      val parsed = ev.select(
        col("event_type"),
        when(get_json_object(col("props"), "$.k").rlike("^[0-9]+$"),
          get_json_object(col("props"), "$.k").cast("long")).as("k"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k2"))
      parsed.filter(col("k") > 50)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(when(col("k2") === col("k"), 1)).as("n_typed"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          // Det.davg, not round(avg,4): the group count is arbitrary, so
          // the quotient can terminate on a 5th-decimal half-tie where
          // the engines round opposite ways (q13/q33 class)
          graft.Det.davg(col("k"), 0).as("avg_k"))
        // nulls-last pin: a NULL event_type group would sort first in
        // Spark (asc = NULLS FIRST) and last in the DuckDB oracle
        .orderBy(col("event_type").asc_nulls_last)
    }),

    // q27: array higher-order functions over embeddings. Empty-array
    // domain pinned (q66's class): Spark folds [] to 0.0 where DuckDB's
    // list_sum([]) is NULL, and element_at([], 1) throws under ANSI
    // where embedding[1] is NULL — only non-empty vectors participate,
    // mirrored in the oracle's WHERE.
    "q27_array_fns" -> ((s, d) =>
      t(s, d, "embeddings")
        .filter(size(col("embedding")) > 0)
        .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
        round(expr("aggregate(slice(embedding, 1, 8), cast(0.0 as double)," +
          " (a, x) -> a + cast(x as double))"), 4).as("sum8"),
        round(expr("sqrt(aggregate(embedding, cast(0.0 as double)," +
          " (a, x) -> a + cast(x as double) * cast(x as double)))"), 4)
          .as("l2"),
        expr("cast(array_position(embedding, array_max(embedding)) as bigint)")
          .as("argmax_pos"),
        expr("cast(size(filter(embedding, x -> x > 0)) as bigint)").as("n_pos"))
        .orderBy("vec_id")),

    // q28: map functions (str_to_map on a synthesized k=v;k=v column)
    "q28_map_fns" -> ((s, d) =>
      t(s, d, "customer")
        .withColumn("kv", concat(lit("seg="), col("c_mktsegment"),
          lit(";nat="), col("c_nationkey").cast("string")))
        .withColumn("m", expr("str_to_map(kv, ';', '=')"))
        .select(col("c_custkey"), col("kv"),
          element_at(col("m"), "seg").as("seg"),
          element_at(col("m"), "nat").cast("long").as("nat"),
          size(map_keys(col("m"))).cast("long").as("nkeys"))
        .orderBy("c_custkey"))
  )

  val oracle: Map[String, String] = Map(
    "q23_string_fns" ->
      """SELECT p_partkey, upper(p_name) AS up_name, lower(p_brand) AS lo_brand,
           length(p_name) AS name_len, substring(p_name, 1, 5) AS name5,
           concat_ws('-', p_brand, p_type) AS bt,
           string_split(p_name, ' ')[1] AS first_tok,
           regexp_extract(p_name, '(\w+)$', 1) AS last_tok,
           regexp_replace(p_type, 'E', 'X', 'g') AS rep,
           trim('  ' || p_name || ' ') AS trimmed
         FROM part ORDER BY p_partkey""",

    "q24_date_fns" ->
      """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
           day(o_orderdate) AS dom, quarter(o_orderdate) AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon_start,
           date_diff('day', DATE '1995-01-01', o_orderdate) AS dd,
           dayofweek(o_orderdate) + 1 AS dow
         FROM orders ORDER BY o_orderkey""",

    "q25_math_cond" ->
      """SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4) AS abs_d,
           round(sqrt(l_extendedprice), 3) AS r1,
           CAST(floor(l_quantity) AS BIGINT) AS fl,
           CAST(ceil(l_quantity) AS BIGINT) AS ce,
           CAST(l_linenumber % 3 AS BIGINT) AS m3,
           round(power(l_quantity, 2), 2) AS qty_sq,
           CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS sizecat,
           coalesce(nullif(l_returnflag, 'N'), 'X') AS flag2,
           greatest(l_tax, l_discount) AS gr,
           least(l_tax, l_discount) AS le
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q26_json_fns" ->
      s"""SELECT event_type, count(*) AS n,
           count(*) AS n_typed,
           CAST(sum(k) AS BIGINT) AS sum_k,
           min(k) AS min_k, max(k) AS max_k,
           ${graft.Det.sqlDavg("k", 0)} AS avg_k
         FROM (SELECT event_type,
                 CASE WHEN regexp_matches(
                        json_extract_string(props, '$$.k'), '^[0-9]+$$')
                   THEN CAST(json_extract_string(props, '$$.k') AS BIGINT)
                 END AS k
               FROM events) t
         WHERE k > 50 GROUP BY event_type ORDER BY event_type""",

    "q27_array_fns" ->
      """SELECT vec_id, len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) AS e1,
           round(list_sum(list_transform(embedding[1:8],
             x -> CAST(x AS DOUBLE))), 4) AS sum8,
           round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2,
           CAST(list_position(embedding, list_aggregate(embedding, 'max'))
             AS BIGINT) AS argmax_pos,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
         FROM embeddings WHERE len(embedding) > 0 ORDER BY vec_id""",

    "q28_map_fns" ->
      """SELECT c_custkey,
           'seg=' || c_mktsegment || ';nat=' || CAST(c_nationkey AS VARCHAR) AS kv,
           regexp_extract('seg=' || c_mktsegment || ';nat='
             || CAST(c_nationkey AS VARCHAR), 'seg=([^;]+)', 1) AS seg,
           CAST(regexp_extract('seg=' || c_mktsegment || ';nat='
             || CAST(c_nationkey AS VARCHAR), 'nat=(\d+)', 1) AS BIGINT) AS nat,
           CAST(len(string_split('seg=' || c_mktsegment || ';nat='
             || CAST(c_nationkey AS VARCHAR), ';')) AS BIGINT) AS nkeys
         FROM customer ORDER BY c_custkey"""
  )
}
