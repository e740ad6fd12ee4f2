package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.queries.EventTime

/** Structured Streaming variants of the event-time queries (SURVEY.md §7
  * P6): the same q29–q31 aggregations driven by a streaming file source
  * with an event-time watermark. Correctness is streaming-batch parity
  * (StreamingSpec), not the DuckDB oracle.
  *
  * At scale this is the production shape: a file/Kafka source feeding
  * watermarked windowed state; the batch queries share the identical
  * aggregation builders, so parity holds by construction once the
  * watermark has expired all state.
  */
object StreamingWindows {

  /** Parquet schema of the events table as stored on disk (ts is
    * TIMESTAMP(NANOS), which Spark reads as long under nanosAsLong). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming scan of the events table (one parquet file = one
    * micro-batch in tests; a directory of arriving files in production). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the streaming file source wants a directory: scan the SF dir with a
    // glob picking just the events file
    spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def tumbling(spark: SparkSession, dir: String,
      watermark: String = "10 minutes"): DataFrame =
    EventTime.tumblingAgg(
      eventsStream(spark, dir).withWatermark("ts", watermark))

  def sliding(spark: SparkSession, dir: String,
      watermark: String = "10 minutes"): DataFrame =
    EventTime.slidingAgg(
      eventsStream(spark, dir).withWatermark("ts", watermark))

  def session(spark: SparkSession, dir: String,
      watermark: String = "10 minutes"): DataFrame =
    EventTime.sessionAgg(
      eventsStream(spark, dir).withWatermark("ts", watermark)
        .dropDuplicates("user_id", "ts"))

  /** Run a streaming frame to a memory sink until the source drains;
    * returns the query (caller reads `spark.table(name)` then stops). */
  def runToMemory(df: DataFrame, name: String,
      mode: String = "append"): StreamingQuery = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q
  }
}
