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
}
