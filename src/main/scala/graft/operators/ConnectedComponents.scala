package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components via min-label propagation — the
  * canonical "beyond plain SQL" dedup operator: near-duplicate PAIRS
  * only become removable once they are grouped into clusters with a
  * canonical representative (the minimum doc id).
  *
  * Each iteration is one join + one min-aggregation (both shuffle on the
  * node key); labels only decrease, so the fixpoint is reached after
  * diameter(graph) iterations and the loop exits early via a cheap
  * convergence count. Lineage is truncated per iteration so the plan
  * does not double — with `reliable = false` via localCheckpoint
  * (executor-block storage, fastest), with `reliable = true` via
  * checkpoint() to the configured checkpoint dir, which survives
  * executor loss: on a 1000-executor cluster a multi-hour BSP loop over
  * localCheckpoint blocks dies with the first lost executor, so
  * production runs at scale should pass `reliable = true` (and set
  * `SparkContext.setCheckpointDir` to a durable FS). This is the
  * standard BSP/Pregel shape expressed in DataFrame operators.
  */
object ConnectedComponents {

  /** edges: two numeric columns (a, b), undirected. Returns
    * (node, cluster_id = smallest reachable node id).
    *
    * Throws IllegalStateException if maxIter is reached before the
    * fixpoint — min-label propagation needs diameter(graph) iterations,
    * so returning the non-converged labels would silently mislabel long
    * chains. An empty edge set short-circuits to an empty result (the
    * potential-sum probe would otherwise NPE on sum-of-nothing = NULL).
    *
    * `reliable = true` requires `spark.sparkContext.setCheckpointDir` to
    * be set (IllegalStateException otherwise, before any work runs).
    */
  def run(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, reliable: Boolean = false): DataFrame = {
    if (reliable &&
        edges.sparkSession.sparkContext.getCheckpointDir.isEmpty)
      throw new IllegalStateException(
        "reliable = true needs SparkContext.setCheckpointDir(<durable fs>)")
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()

    val sym = truncate(
      edges.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
        .distinct())

    var labels = truncate(
      sym.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node")))

    // labels only decrease, so sum(lbl) is a strictly decreasing
    // potential function: an unchanged sum IS the fixpoint — one cheap
    // aggregate per iteration instead of a join-based change count.
    // The sum runs over DECIMAL(38,0): a Long sum could wrap on billions
    // of 64-bit ids and fake an unchanged potential. NULL = empty frame.
    def lblSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("lbl").cast(DecimalType(38, 0))))
        .head().getDecimal(0))

    var prevSum = lblSum(labels)
    if (prevSum.isEmpty) // no edges -> no nodes -> no clusters
      return labels.select(col("node"), col("lbl").as("cluster_id"))

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrLabels = sym
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("lbl"))
      val next = truncate(
        labels.union(nbrLabels)
          .groupBy("node").agg(min(col("lbl")).as("lbl")))
      val s = lblSum(next)
      labels = next
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations; " +
          "raise maxIter above the graph diameter")
    labels.select(col("node"), col("lbl").as("cluster_id"))
  }
}
