package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming exact deduplication — the streaming twin of batch q32
  * (md5 content hash, keep one row per hash), completing the
  * batch/stream parity set alongside the q29–q31 windows.
  *
  * Semantics difference vs batch, by design: batch q32 keeps the MINIMUM
  * doc_id per hash (a global decision), while a stream keeps the FIRST
  * ARRIVAL per hash — the only decision an unbounded stream can make.
  * Parity is therefore on the deduped hash set + count, not on which
  * representative survives (StreamingSpec pins both).
  *
  * Two state regimes:
  *  - [[exactDedup]]: exact forever-dedup; state grows with the number
  *    of DISTINCT hashes (bounded by corpus cardinality, not stream
  *    length — ~16 bytes/hash in the state store; at 10^10 distinct docs
  *    shard the state by running one query per hash-prefix partition).
  *  - [[exactDedupWatermarked]]: `dropDuplicatesWithinWatermark` over an
  *    event-time column — state expires past the watermark, so memory is
  *    bounded by the dedup horizon (duplicates separated by more than
  *    the delay may both survive; that is the standard trade at scale).
  */
object StreamingDedup {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming scan of the documents table (one parquet file = one
    * micro-batch in tests; a directory of arriving files in production). */
  def docsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** First-arrival exact dedup by content hash (exact, unbounded state). */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.withColumn("h", md5(col("text")))
      .dropDuplicates("h")
      .select("h", "doc_id", "lang")

  /** Watermarked dedup: duplicates arriving within `delay` of each other
    * (by event time `tsCol`) are collapsed; state expires past the
    * watermark. `tsCol` must be a TIMESTAMP column on `docs`. */
  def exactDedupWatermarked(docs: DataFrame, tsCol: String,
      delay: String): DataFrame =
    docs.withColumn("h", md5(col("text")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("h")
      .select("h", "doc_id", "lang")
}
