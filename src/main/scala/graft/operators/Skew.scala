package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join splitting covers joins;
  * this covers aggregation hot keys: a two-phase salted aggregate that
  * spreads one pathological key over `saltBuckets` reducers before the
  * final combine. At 100 TB a single hot group key (one viral user, one
  * empty-string token) otherwise serializes an entire stage onto one
  * task.
  */
object Skew {

  /** Supported mergeable aggregate specs: (output name, input column,
    * kind) where kind in {count, sum, min, max}. The two phases compose
    * as count->sum, sum->sum, min->min, max->max. */
  case class AggSpec(name: String, input: Column, kind: String)

  def count(name: String): AggSpec = AggSpec(name, lit(1L), "count")
  def sum(name: String, c: Column): AggSpec = AggSpec(name, c, "sum")
  def min(name: String, c: Column): AggSpec = AggSpec(name, c, "min")
  def max(name: String, c: Column): AggSpec = AggSpec(name, c, "max")

  /** groupBy(keys).agg(specs) computed as salt-phase + combine-phase.
    * Results are identical to the direct aggregation (asserted in
    * SkewSpec); only the shuffle distribution changes.
    *
    * The salt is derived from ROW CONTENT (xxhash64 over the key and
    * aggregate-input columns plus the seed — not every column, which
    * would crash on unhashable MapType payload columns and pay a
    * full-row hash for nothing), never from a non-deterministic
    * expression like monotonically_increasing_id: when a lost shuffle
    * partition forces a map-task recompute, content-hash salts
    * reproduce exactly, so reducers that already fetched the first
    * attempt's output agree with the retry (the SPARK-23207 failure
    * class). The trade-off is that rows identical on (keys, inputs)
    * share a salt — aggregation stays correct (phase 2 merges all
    * salts), only duplicate-heavy hot keys spread across fewer than
    * saltBuckets reducers. */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      specs: Seq[AggSpec], seed: Long = 42L): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(
        (keys.map(col) ++ specs.map(_.input) :+ lit(seed)): _*),
        lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggExprs(specs, phase1 = true).head,
        aggExprs(specs, phase1 = true).tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggExprs(specs, phase1 = false).head,
        aggExprs(specs, phase1 = false).tail: _*)
  }

  private def aggExprs(specs: Seq[AggSpec], phase1: Boolean): Seq[Column] =
    specs.map { s =>
      val c = if (phase1) s.input else col(s.name)
      (s.kind match {
        case "count" => if (phase1) functions.count(c) else functions.sum(c)
        case "sum"   => functions.sum(c)
        case "min"   => functions.min(c)
        case "max"   => functions.max(c)
        case k => throw new IllegalArgumentException(s"unsupported agg: $k")
      }).as(s.name)
    }

  // local alias so AggSpec helper names don't shadow the sql functions
  private object functions {
    def count(c: Column): Column = org.apache.spark.sql.functions.count(c)
    def sum(c: Column): Column = org.apache.spark.sql.functions.sum(c)
    def min(c: Column): Column = org.apache.spark.sql.functions.min(c)
    def max(c: Column): Column = org.apache.spark.sql.functions.max(c)
  }
}
