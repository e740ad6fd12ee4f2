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
  * WINNING op (highest seq applied so far), an explicit `live` flag,
  * and the post-apply body. The latest emission per key IS the view;
  * `live = false` is the tombstone, applied by absence exactly like
  * the batch side (StreamingSpec proves set equality with oracled
  * q137). Liveness is its own column — NOT "body is null" — because a
  * NULL-text document is a legal live row (q110/snapshotSides: a
  * NULL-text doc has a NULL digest), so body nullness cannot double as
  * the delete marker. For the same reason state wraps the body in a
  * product ([[CdcApply.Doc]]): ValueState rejects a bare null value,
  * and a null-body insert must materialize, not kill the query.
  *
  * OUT-OF-ORDER feeds (r10): conflict resolution is last-writer-wins
  * on the per-key `seq` — an op applies only when its seq is strictly
  * greater than the stored one, so an update delivered BEFORE its
  * insert sticks (the late insert is recognized as stale and skipped),
  * a delete beats any lower-seq resurrection, and duplicate deliveries
  * (seq equal to the stored one) are idempotent no-ops — at-least-once
  * transports apply exactly-once. The price: a delete stores a
  * TOMBSTONE (live = false, seq retained) instead of clearing state,
  * because the seq watermark is what refuses a late lower-seq insert;
  * state is therefore O(keys ever seen), not O(live keys). At 100 TB a
  * deployment bounds that with the store's TTL knob sized to the
  * feed's maximum disorder horizon (tombstones older than the horizon
  * can never lose to a late write); the parity fixtures keep TTL off
  * so they are exact over any staging, and a dedicated StreamingSpec
  * case (r11) runs a SHORT TTL to pin what eviction actually costs: a
  * straggler landing after its tombstone evicted is resurrected — see
  * [[CdcApply.applyChanges]].
  */
class CdcApplyProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[
    Long, (Long, Long, String, String), (Long, String, Boolean, String)] {
  // in: (doc_id, seq, op, text) — op ∈ insert|update|delete
  // out: (doc_id, winning_op, live, body)
  @transient private var body: ValueState[CdcApply.Doc] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    body = getHandle.getValueState[CdcApply.Doc]("body",
      Encoders.product[CdcApply.Doc], ttl)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, String, String)],
      timerValues: TimerValues): Iterator[(Long, String, Boolean, String)] = {
    val ordered = rows.toSeq.sortBy(_._2)
    if (ordered.isEmpty) return Iterator.empty
    var cur = if (body.exists()) body.get() else null
    ordered.foreach { case (_, seq, op, text) =>
      // the documented contract is op ∈ insert|update|delete — a
      // malformed or differently-cased op must fail loudly EVEN WHEN
      // STALE, not silently upsert (a mangled "Delete" resurrecting
      // the key as a live null-body document is corruption, not
      // tolerance)
      val live = op match {
        case "delete" => false
        case "insert" | "update" => true
        case other => throw new IllegalArgumentException(
          s"CDC op must be insert|update|delete, got '$other' " +
            s"(doc_id=$key, seq=$seq)")
      }
      // last-writer-wins: strictly-greater seq applies; equal seq is a
      // duplicate delivery and lower seq a late straggler — both skip
      if (cur == null || seq > cur.seq)
        cur = CdcApply.Doc(if (live) text else null, seq, op, live)
    }
    body.update(cur)
    Iterator.single((key, cur.op, cur.live, if (cur.live) cur.text else null))
  }
}

object CdcApply {

  /** Non-null state wrapper: the stored value is always a Doc (so the
    * state store never sees a bare null), the text inside may be null.
    * Carries the winning op's seq (the LWW watermark), the op itself,
    * and liveness — a dead key keeps its Doc as a tombstone so late
    * lower-seq writes can still lose to it. */
  final case class Doc(text: String, seq: Long, op: String, live: Boolean)

  /** Read the materialized view directly from the applying query's
    * state store (Spark's state data source) — the serving-layer read
    * path: no stream stop, no sink reconstruction, a plain batch
    * DataFrame (doc_id, text) of the LIVE keys. Tombstoned keys ARE
    * in the state (since the r10 LWW change a delete stores a
    * live=false Doc with its seq retained, so a late out-of-order
    * write can still lose to it — state is O(keys ever seen)); this
    * read hides them via the live filter. At 100 TB this is the
    * point of CDC maintenance: the view is queryable in place, from
    * the same checkpoint the stream commits to, partition-parallel
    * over the store's shards. Tombstones (kept for LWW against late
    * writes) are filtered here — the VIEW is the live keys. */
  def readView(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("statestore")
      .option("stateVarName", "body")
      .load(checkpoint)
      .filter(col("value").getField("live"))
      .select(col("key").getField("value").cast("long").as("doc_id"),
        col("value").getField("text").as("text"))

  /** Apply a streaming change feed with columns (doc_id, seq, op,
    * text); update mode — the latest row per key is the view, rows
    * with live = false are tombstones.
    *
    * `ttl` is the state-eviction knob the scaladoc's 100 TB story
    * names: sized to the feed's maximum disorder horizon, it bounds
    * state at O(keys written inside the horizon) instead of O(keys
    * ever seen). The trade is explicit and EXERCISED by StreamingSpec
    * (r11): a straggler arriving AFTER its key's tombstone was evicted
    * finds no seq watermark to lose against and RESURRECTS the key —
    * which is precisely why the TTL must outlive the transport's
    * worst-case disorder, and why the default stays NONE (exact LWW
    * over any staging). TTL is wall-clock-based, so a non-NONE config
    * runs the query in processing-time mode. */
  def applyChanges(spark: SparkSession, changes: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE)
      : Dataset[(Long, String, Boolean, String)] = {
    import spark.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    changes.select(col("doc_id").cast("long"), col("seq").cast("long"),
        col("op"), col("text"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .transformWithState(new CdcApplyProcessor(ttl),
        timeMode, OutputMode.Update())
  }
}
