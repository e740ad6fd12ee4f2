package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming CDC apply — the online twin of batch q137's snapshot
  * MERGE: a keyed change feed (insert / update / delete per doc_id)
  * maintained as a materialized view in per-key ValueState. Applying
  * the same change set that the batch MERGE resolves must leave the
  * store holding exactly the batch-merged table — the "streaming
  * materialized view ≡ batch backfill" guarantee that lets a corpus
  * serve reads continuously while its maintenance runs as CDC instead
  * of snapshot rebuilds (at 100 TB a rebuild moves everything; a CDC
  * feed moves only the delta, and state is O(live keys)).
  *
  * Emission is update-mode: one row per key per batch carrying the
  * LAST applied op and the post-apply body (null body = tombstone).
  * The latest emission per key IS the view; tombstoned keys are
  * "applied by absence" exactly like the batch side (StreamingSpec
  * proves set equality with oracled q137). Within a batch, ops apply
  * in ascending seq order — CDC feeds are ordered per key by
  * construction; cross-key order is irrelevant to a keyed store.
  */
class CdcApplyProcessor extends StatefulProcessor[
    Long, (Long, Long, String, String), (Long, String, String)] {
  // in: (doc_id, seq, op, text) — op ∈ insert|update|delete
  // out: (doc_id, last_op, body_or_null)
  @transient private var body: ValueState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    body = getHandle.getValueState[String]("body",
      Encoders.STRING, TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, String, String)],
      timerValues: TimerValues): Iterator[(Long, String, String)] = {
    val ordered = rows.toSeq.sortBy(_._2)
    var lastOp: String = null
    ordered.foreach { case (_, _, op, text) =>
      lastOp = op
      if (op == "delete") body.clear() else body.update(text)
    }
    if (lastOp == null) Iterator.empty
    else Iterator.single(
      (key, lastOp, if (body.exists()) body.get() else null))
  }
}

object CdcApply {

  /** Apply a streaming change feed with columns (doc_id, seq, op,
    * text); update mode — the latest row per key is the view. */
  def applyChanges(spark: SparkSession,
      changes: DataFrame): Dataset[(Long, String, String)] = {
    import spark.implicits._
    changes.select(col("doc_id").cast("long"), col("seq").cast("long"),
        col("op"), col("text"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .transformWithState(new CdcApplyProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
