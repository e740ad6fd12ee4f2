package graft

import org.apache.spark.sql.SparkSession

/** One-call session factory encoding the configuration the library is
  * verified under, so a user gets the same semantics the oracle gate
  * runs with:
  *
  *  - graft's native functions installed (GraftExtensions);
  *  - UTC session timezone — every date_format/window oracle assumes it;
  *  - shuffle partitions sized to the cluster (caller-provided;
  *    local[N] should pass N, a real cluster ~2-3x its total cores —
  *    AQE coalesces down from there at runtime);
  *  - AQE left ON (Spark default) — stage reuse, skew splits and
  *    partition coalescing are part of the verified plan shapes.
  *
  * `Tables.load` handles the nanos-timestamp parquet quirk per read;
  * it is not a session-level concern.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // r16: the default codegen class cache holds 100 entries (static
      // conf) — a multi-query workload (the 160-entry bench, any
      // dashboard fanning out dozens of distinct plans) evicts every
      // fragment between repeat executions, so each re-run pays janino
      // compilation on the DRIVER (serial, between stages) and restarts
      // HotSpot tiered compilation from zero on a fresh class (the
      // executor-side cost: short fixture-scale stages finish before C2
      // ever kicks in, measured as 2-6x CPU on identical stages and the
      // dominant share of run-to-run variance). One generated class is
      // a few KB — 10k entries is tens of MB of metaspace, nothing at
      // any deployment size, and workloads with fewer shapes simply
      // never fill it. Measured: -10% on the 11-key regression subset,
      // q143's serial merge-round chain -39% (OPTIMIZATION_r16.md §2).
      .config("spark.sql.codegen.cache.maxEntries", "10000")

  /** Local session for tests/tools: local[cores] with matching shuffle
    * parallelism. */
  def local(cores: Int): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()
}
