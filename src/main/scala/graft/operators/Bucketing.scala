package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffling fact tables into N buckets on
  * their join key lets every subsequent equi-join and aggregation on that
  * key run shuffle-free (Exchange elided, verified in BucketingSpec).
  * This is the standing answer to "is there a shuffle here that becomes
  * the bottleneck at scale?" for repeatedly-joined 100 TB facts: pay the
  * shuffle once at ingest, never again.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table
    * (idempotent: drops the table and any orphaned location first — the
    * in-memory catalog forgets tables across sessions but their files
    * survive in the warehouse dir). `moreKeys` extends the bucket/sort
    * spec to composite join keys — e.g. the (band, mh) dedup state,
    * where exact bucket-key/join-key agreement is what lets the probe
    * join elide the corpus-side exchange. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, moreKeys: String*): Unit = {
    // these helpers target simple names in the default database — a
    // qualified name would put files under <db>.db/<t>, which the
    // orphan cleanup below would miss
    require(!table.contains("."),
      s"use a simple (unqualified) table name, got: $table")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // the catalog lowercases managed-table directories — clean up the
    // path Spark actually uses, not the identifier as typed. Through
    // the Hadoop FileSystem API, not java.io.File: a non-local
    // warehouse (hdfs://, s3a://) would make a File-based rm silently
    // no-op and the subsequent saveAsTable fail on the stale location
    // (and java.net.URI chokes on paths with spaces).
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.format("parquet")
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Append rows to an existing bucketed table with the SAME bucket
    * spec (bucket spec must be restated on every append; Spark rejects
    * a mismatched spec rather than silently corrupting co-location).
    * This is the incremental-state maintenance step: after a batch is
    * deduped against the corpus state (shuffle-free probe, see
    * BucketingSpec), the batch's own hashes/bands are appended here so
    * the next batch probes the grown state — the corpus is never
    * rewritten, and each appended file lands pre-bucketed on the probe
    * keys. */
  def appendBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, moreKeys: String*): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .mode("append")
      .saveAsTable(table)
}
