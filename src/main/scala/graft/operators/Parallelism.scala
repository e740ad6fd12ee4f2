package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Source-parallelism guard for CPU-heavy per-row map stages.
  *
  * Spark's map-side parallelism is bounded by the input split count. At
  * production scale (thousands of parquet files / row groups) that is
  * plenty, but a small single-row-group file — the shape of a dev
  * fixture, a dimension snapshot, or the tail partition of a skewed
  * layout — plans as ONE task, and every expensive per-document kernel
  * downstream (shingling, minhash signatures, similarity digests) runs
  * serially no matter how many cores the cluster has.
  *
  * [[widen]] inserts one hash exchange ONLY when the planned input
  * parallelism is materially below the session's shuffle parallelism, so
  * the big-data path stays shuffle-free while the small-file path gets
  * its cores back. The check reads the planned partition count (file
  * listing — no job runs) at query-construction time.
  */
object Parallelism {

  /** Repartition `df` by `key` to the session's shuffle parallelism iff
    * its planned partition count is below half of it. Hash partitioning
    * on a provided key (never round-robin) keeps the result
    * deterministic under retries and across runs.
    */
  def widen(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df // micro-batch parallelism is the
    // source's concern; .rdd is also undefined on a streaming frame
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions * 2 >= n) df else df.repartition(n, key)
  }
}
