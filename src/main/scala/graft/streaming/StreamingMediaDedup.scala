package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming near-duplicate detection for MEDIA content hashes — the
  * streaming twin of the batch capped-band plan (q148 image dHash /
  * q151 audio fingerprint, graft.operators.HashBands), in the same
  * stream-vs-static-corpus shape as the text twins (StreamingDedup
  * .nearDupNew / prefixJaccardNew): an ARRIVING image or track, hashed
  * map-side by the same codegen'd expression the batch plan uses
  * (dhash64 / audiofp64), is probed against a static corpus's capped
  * band postings and emits one row per corpus near-match. The crawl
  * use case this exists for: drop a re-encoded / resized / gain-shifted
  * copy the moment it arrives, instead of re-running the batch pair
  * audit over the whole corpus.
  *
  * The whole stream side is STATELESS (the StreamingDedup discipline):
  * band explosion is a map-side projection of the arriving row, the
  * probe is a stream-static equi-join on (band, value), and the Hamming
  * verify plus pair dedup are row-local filters — no watermark, no
  * state store, nothing grows with stream length. The corpus side is
  * never broadcast (corpus-derived, unbounded — the round-12
  * adjudication) and in production is an incrementally-maintained
  * table bucketed on (bk, bv) (operators/Bucketing), so per-batch
  * probes co-locate without reshuffling the corpus.
  *
  * Pair DEDUP is stateless via the canonical-witness trick
  * (StreamingDedup.prefixJaccardNew's): a pair within Hamming <= 3 can
  * agree on up to 4 bands and would surface once per shared UNDER-CAP
  * band, but an unbounded stream cannot `distinct()` — instead each
  * posting row carries `okmask`, the bitmap of its corpus member's
  * under-cap bands, so the joined row can decide row-locally whether
  * ITS band is the smallest shared under-cap band. Exactly one row per
  * matching pair survives, deterministically.
  *
  * Cap semantics match batch HashBands EXACTLY, with the df measured
  * over the CORPUS (the only df a static state can know): a band
  * bucket with more than `cap` corpus members is absent from the
  * postings, so an arriving flat image / silent track (hash 0 — the
  * degenerate class) probes into nothing and emits nothing, exactly as
  * the batch plan drops the bucket. Arrivals do not update the state;
  * refreshing it is the incremental-rebuild path (the q73 twin's
  * contract). Parity with the batch pair set is pinned in
  * StreamingSpec against a pure-Scala reference of these semantics.
  */
object StreamingMediaDedup {

  /** Static corpus state: capped band postings (bk, bv, b_id, hb,
    * okmask) — one row per (corpus member, band) whose (band, value)
    * bucket has at most `cap` corpus members; `okmask` bit j says
    * member b's band j survived the cap (the canonical-witness input).
    * PERSISTED like StreamingDedup.corpusState: the stream references
    * it every micro-batch in four band branches — unpersisted, the
    * corpus scan + hash pipeline would re-execute per batch. Null
    * hashes (undecodable media rows — the bounded-degradation
    * contract) are excluded up front. */
  def bandPostings(hashes: DataFrame, idCol: String, hashCol: String,
      cap: Int = graft.operators.HashBands.BandBucketCap): DataFrame = {
    val bands = hashes
      .select(col(idCol).cast("long").as("b_id"),
        col(hashCol).cast("long").as("hb"))
      .filter(col("hb").isNotNull)
      .select(col("b_id"), col("hb"),
        explode(expr("array(0, 1, 2, 3)")).as("bk"))
      .withColumn("bv",
        expr("shiftright(hb, bk * 16)").bitwiseAND(lit(65535L)))
    // df-cap over the CORPUS (the q148/q151 stop-bucket discipline);
    // the under-cap set joins back by key — never broadcast, never
    // collected: at 100 TB the bucket universe is corpus-sized
    val under = bands.groupBy("bk", "bv")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap)
      .select("bk", "bv")
    val kept = bands.join(under, Seq("bk", "bv"))
    val mask = kept.groupBy("b_id")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), bk)")).as("okmask"))
    kept.join(mask, "b_id")
      .select("bk", "bv", "b_id", "hb", "okmask")
      .persist()
  }

  /** Smallest shared under-cap band of (ha, hb, okmask) — the
    * canonical witness. Band j is shared iff the xor's j-th 16-bit
    * lane is zero; under-cap iff okmask bit j is set. A joined row
    * exists only via some such band, so the CASE always hits. */
  private def witnessBand: Column =
    (0 to 3).foldRight(lit(-1): Column) { (j, els) =>
      when(expr(s"((ha ^ hb) >> ${j * 16}) & 65535") === lit(0L) &&
          expr(s"(okmask >> $j) & 1") === lit(1L), lit(j))
        .otherwise(els)
    }

  /** Near-matches of each ARRIVING hash against the corpus postings:
    * (a_id, b_id, hamming <= maxHamming), exactly one row per matching
    * pair. `arriving` may be a stream (the twin) or a batch frame (the
    * backfill path — same code, the RAG-chunking precedent). Arrivals
    * whose hash failed (null — short/corrupt media) emit nothing. */
  def nearDupNew(arriving: DataFrame, idCol: String, hashCol: String,
      postings: DataFrame, maxHamming: Int = 3): DataFrame = {
    val arr = arriving
      .select(col(idCol).cast("long").as("a_id"),
        col(hashCol).cast("long").as("ha"))
      .filter(col("ha").isNotNull)
      .select(col("a_id"), col("ha"),
        explode(expr("array(0, 1, 2, 3)")).as("bk"))
      .withColumn("bv",
        expr("shiftright(ha, bk * 16)").bitwiseAND(lit(65535L)))
    arr.join(postings, Seq("bk", "bv"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxHamming && col("a_id") =!= col("b_id"))
      .filter(col("bk") === witnessBand)
      .select("a_id", "b_id", "hamming")
  }
}
