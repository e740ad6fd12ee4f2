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
  * LAST applied op, an explicit `live` flag, and the post-apply body.
  * The latest emission per key IS the view; `live = false` is the
  * tombstone, applied by absence exactly like the batch side
  * (StreamingSpec proves set equality with oracled q137). Liveness is
  * its own column — NOT "body is null" — because a NULL-text document
  * is a legal live row (q110/snapshotSides: a NULL-text doc has a NULL
  * digest), so body nullness cannot double as the delete marker. For
  * the same reason state wraps the body in a product ([[CdcApply.Doc]]):
  * ValueState rejects a bare null value, and a null-body insert must
  * materialize, not kill the query. Within a batch, ops apply in
  * ascending seq order — CDC feeds are ordered per key by
  * construction; cross-key order is irrelevant to a keyed store.
  */
class CdcApplyProcessor extends StatefulProcessor[
    Long, (Long, Long, String, String), (Long, String, Boolean, String)] {
  // in: (doc_id, seq, op, text) — op ∈ insert|update|delete
  // out: (doc_id, last_op, live, body)
  @transient private var body: ValueState[CdcApply.Doc] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    body = getHandle.getValueState[CdcApply.Doc]("body",
      Encoders.product[CdcApply.Doc], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, String, String)],
      timerValues: TimerValues): Iterator[(Long, String, Boolean, String)] = {
    val ordered = rows.toSeq.sortBy(_._2)
    var lastOp: String = null
    ordered.foreach { case (_, seq, op, text) =>
      lastOp = op
      op match {
        case "delete" => body.clear()
        case "insert" | "update" => body.update(CdcApply.Doc(text))
        // the documented contract is op ∈ insert|update|delete — a
        // malformed or differently-cased op must fail loudly, not
        // silently upsert (a mangled "Delete" resurrecting the key as a
        // live null-body document is corruption, not tolerance)
        case other => throw new IllegalArgumentException(
          s"CDC op must be insert|update|delete, got '$other' " +
            s"(doc_id=$key, seq=$seq)")
      }
    }
    if (lastOp == null) Iterator.empty
    else if (body.exists())
      Iterator.single((key, lastOp, true, body.get().text))
    else Iterator.single((key, lastOp, false, null))
  }
}

object CdcApply {

  /** Non-null state wrapper: the stored value is always a Doc (so the
    * state store never sees a bare null), the text inside may be null. */
  final case class Doc(text: String)

  /** Read the materialized view directly from the applying query's
    * state store (Spark's state data source) — the serving-layer read
    * path: no stream stop, no sink reconstruction, a plain batch
    * DataFrame (doc_id, text) of the LIVE keys (tombstoned keys are
    * absent because delete clears the state). At 100 TB this is the
    * point of CDC maintenance: the view is queryable in place, from
    * the same checkpoint the stream commits to, partition-parallel
    * over the store's shards. */
  def readView(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("statestore")
      .option("stateVarName", "body")
      .load(checkpoint)
      .select(col("key").getField("value").cast("long").as("doc_id"),
        col("value").getField("text").as("text"))

  /** Apply a streaming change feed with columns (doc_id, seq, op,
    * text); update mode — the latest row per key is the view, rows
    * with live = false are tombstones. */
  def applyChanges(spark: SparkSession,
      changes: DataFrame): Dataset[(Long, String, Boolean, String)] = {
    import spark.implicits._
    changes.select(col("doc_id").cast("long"), col("seq").cast("long"),
        col("op"), col("text"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .transformWithState(new CdcApplyProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
