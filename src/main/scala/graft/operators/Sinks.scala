package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Partitioned columnar sinks: hive-style directory partitioning so
  * downstream reads prune whole partitions at planning time (the
  * standing layout for 100 TB fact tables — date/category partitions +
  * parquet row-group statistics under them).
  */
object Sinks {

  /** Write `df` as parquet partitioned by `cols` (hive-style dirs). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV round-trip (header + explicit schema on read — schema inference
    * is a full extra pass at scale, never rely on it). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON-lines round-trip. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC round-trip — the built-in columnar alternative to parquet,
    * with the same predicate-pushdown/partition-pruning story (the
    * reader applies search arguments from row-group statistics). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Text-lines round-trip (single `value` STRING column) — raw-corpus
    * ingest/export; one line per document, so the writer rejects
    * multi-column frames at plan time rather than corrupting output. */
  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
