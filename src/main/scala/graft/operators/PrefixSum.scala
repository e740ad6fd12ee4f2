package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running total (prefix sum) over a global order — the
  * primitive behind sequence packing, global position assignment, and
  * cumulative-budget curation cuts.
  *
  * The naive formulation, `sum over Window.orderBy(k)` with no
  * partitionBy, collapses the whole table into ONE task (Spark warns
  * "No Partition Defined for Window" — at 100 TB that is not a
  * slowdown, it is an OOM). This operator is the canonical two-phase
  * scalable shape instead:
  *
  *   1. range-repartition by the order column and sort within
  *      partitions — partitions are order-contiguous;
  *   2. one tiny aggregate (numPartitions rows) computes each
  *      partition's total; a window over THAT (bounded by the partition
  *      count, explicitly fine) turns totals into per-partition starting
  *      offsets;
  *   3. offsets broadcast-join back; each row's running total is its
  *      partition offset + a partition-LOCAL running sum (a partitioned
  *      window — parallel).
  *
  * The input is materialized (localCheckpoint) after the range shuffle
  * because `spark_partition_id()` feeds two consumers: without the
  * barrier the totals branch and the output branch could re-sample
  * different range boundaries and disagree on partition ids. The
  * RESULT is boundary-invariant either way; the barrier makes the two
  * branches see the same boundaries. Rows must be unique per
  * `orderCol` for the total to be well-defined (ties within a
  * partition sort arbitrarily among equal keys).
  */
object PrefixSum {

  /** Adds `outCol` = running total of `valueCol` in `orderCol` order
    * (inclusive of the current row). */
  def withRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, numPartitions: Int = 32): DataFrame = {
    val parted = df
      .repartitionByRange(numPartitions, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()

    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted
      .groupBy("__pid").agg(sum(col(valueCol)).as("__ptot"))
      .withColumn("__off", coalesce(sum(col("__ptot")).over(offW), lit(0L)))
      .select("__pid", "__off")

    val localW = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    parted
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__off") + sum(col(valueCol)).over(localW))
      .drop("__pid", "__off")
  }
}
