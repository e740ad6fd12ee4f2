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

  /** Local session for tests/tools: local[cores] with matching shuffle
    * parallelism. */
  def local(cores: Int): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()
}
