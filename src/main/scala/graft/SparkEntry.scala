package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2-B): one
  * entry per operator family, each a (SparkSession, sfDir) => DataFrame.
  * `oracleSql` holds the DuckDB-equivalent SQL for every hash-checked
  * query; entries without oracle SQL (sketches / xxhash64-based ops) are
  * covered by ScalaTest property tests instead.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape); driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q13_hash_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Windows.queries ++ Scalars.queries ++
      EventTime.queries ++ TextOps.queries ++ TextOps.mixQueries ++
      Similarity.queries ++ Dedup.queries ++ Pipeline.queries ++
      ImageDedup.queries ++ AudioDedup.queries ++ Analytics.queries

  def oracleSql: Map[String, String] =
    Relational.oracle ++ Windows.oracle ++ Scalars.oracle ++
      EventTime.oracle ++ TextOps.oracle ++ Similarity.oracle ++
      Dedup.oracle ++ Pipeline.oracle ++ ImageDedup.oracle ++
      AudioDedup.oracle ++ Analytics.oracle
}
