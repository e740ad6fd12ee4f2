package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via min-label propagation — the
  * canonical "beyond plain SQL" dedup operator: near-duplicate PAIRS
  * only become removable once they are grouped into clusters with a
  * canonical representative (the minimum doc id).
  *
  * Each iteration is one join + one min-aggregation (both shuffle on the
  * node key); labels only decrease, so the fixpoint is reached after
  * diameter(graph) iterations and the loop exits early via a cheap
  * convergence count. Lineage is truncated with localCheckpoint so the
  * plan does not double per iteration. This is the standard BSP/Pregel
  * shape expressed in DataFrame operators.
  */
object ConnectedComponents {

  /** edges: two numeric columns (a, b), undirected. Returns
    * (node, cluster_id = smallest reachable node id). */
  def run(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()

    // labels only decrease, so sum(lbl) is a strictly decreasing
    // potential function: an unchanged sum IS the fixpoint — one cheap
    // aggregate per iteration instead of a join-based change count
    def lblSum(df: DataFrame): Long =
      df.agg(sum(col("lbl"))).head().getLong(0)
    var prevSum = lblSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrLabels = sym
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("lbl"))
      val next = labels.union(nbrLabels)
        .groupBy("node").agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      val s = lblSum(next)
      labels = next
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    labels.select(col("node"), col("lbl").as("cluster_id"))
  }
}
