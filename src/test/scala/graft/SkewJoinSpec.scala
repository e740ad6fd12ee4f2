package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** AQE skew-join handling: with the skew thresholds lowered to test
  * scale, a join against one hot key must show skew-split sort-merge
  * partitions in the final adaptive plan — the runtime half of the
  * skew story (graft.operators.Skew's salted aggregation is the
  * compile-time half).
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // 50k rows on ONE key vs uniform keys: partition for key 0 is ~50x
      // the median
      val left = spark.range(0, 50000).select(lit(0L).as("k"), $"id".as("v"))
        .union(spark.range(0, 2000).select(($"id" % 100 + 1).as("k"), $"id".as("v")))
      val right = spark.range(0, 101).select($"id".as("k"), ($"id" * 10).as("w"))
      val joined = left.join(right, Seq("k"))
      joined.collect()
      val p = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case o => o
      }).toString
      assert(p.contains("skew=true"),
        s"expected skew-split partitions in the final plan:\n${p.take(1200)}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
