package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming join surfaces: stream-static enrichment and a watermarked
  * stream-stream interval self-join (the streaming funnel — signups
  * matched to purchases within 7 days). Inner stream-stream matches are
  * emitted in the micro-batch where both sides have arrived, and the
  * watermark + time bound let Spark discard buffered state past
  * s_ts + 7d — bounded state at any scale.
  */
object StreamJoins {

  /** Stream-static: enrich the event stream with a static dimension
    * (broadcastable lookup), the most common production join. */
  def enriched(spark: SparkSession, dir: String,
      dim: DataFrame): DataFrame =
    StreamingWindows.eventsStream(spark, dir)
      .join(broadcast(dim), Seq("event_type"))

  /** Stream-stream interval join: signup events matched to purchase
    * events of the same user within the following 7 days. */
  def streamingFunnel(spark: SparkSession, dir: String,
      watermark: String = "1 hour"): DataFrame = {
    val ev = StreamingWindows.eventsStream(spark, dir)
    val su = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_ts"))
      .withWatermark("s_ts", watermark)
    val pu = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    su.join(pu, expr(
      """user_id = p_user AND
         p_ts >= s_ts AND p_ts <= s_ts + interval 7 days"""))
      .select(col("user_id"), col("s_ts"), col("p_ts"))
  }
}
