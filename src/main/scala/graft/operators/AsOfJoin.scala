package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row with
  * `rightTs <= leftTs` on the same key, optionally within a tolerance.
  *
  * Composed from built-ins (SURVEY.md §2 preference order (a)): tag both
  * sides, union, and carry the most recent right payload forward with a
  * `last(..., ignoreNulls)` running window — one shuffle on the key, one
  * per-partition sort, no per-key driver loops and no custom SparkPlan.
  * At equal timestamps the right row sorts first, so it is visible to a
  * left row at the same instant (standard as-of semantics).
  *
  * Output: all left columns plus the right columns (null where no match).
  * Column names must be disjoint between the two sides.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      toleranceMs: Option[Long] = None): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - key
    require(overlap.isEmpty, s"column names must be disjoint: $overlap")

    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq.filterNot(c => c == key || c == rightTs)
    val lType = org.apache.spark.sql.types.StructType(
      lCols.map(left.schema(_)))
    val rType = org.apache.spark.sql.types.StructType(
      rCols.map(right.schema(_)))

    val l2 = left.select(
      col(key).as("__k"), col(leftTs).cast("timestamp").as("__t"),
      lit(1).as("__is_left"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast("timestamp").as("__rt"),
      lit(null).cast(rType).as("__r"))
    val r2 = right.select(
      col(key).as("__k"), col(rightTs).cast("timestamp").as("__t"),
      lit(0).as("__is_left"),
      lit(null).cast(lType).as("__l"),
      col(rightTs).cast("timestamp").as("__rt"),
      struct(rCols.map(col): _*).as("__r"))

    // Final tie-break term: two right rows with the same (key, ts)
    // would otherwise be ordered arbitrarily, making the carried payload
    // depend on partitioning/run. Hashing the payload gives a stable
    // total order (left rows hash NULL fields to a constant, and their
    // relative order never matters — they carry no payload). Only the
    // HASHABLE payload fields participate: xxhash64 on a MapType is
    // banned since Spark 3.0, so hashing the whole struct would fail
    // ANALYSIS for any caller with a map payload column. Rows
    // differing only inside a map (none of the repo's callers) still
    // order arbitrarily — every other payload stays deterministic.
    val hashableR = rCols.filter(c =>
      Skew.hashableType(right.schema(c).dataType))
    val tieBreak =
      if (hashableR.isEmpty) lit(0L)
      else xxhash64(hashableR.map(c => col("__r").getField(c)): _*)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__is_left"), tieBreak)
      .rowsBetween(Window.unboundedPreceding, 0)

    val unioned = l2.union(r2)

    val carried = unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__match_t", last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)

    val withinTol = toleranceMs match {
      case Some(tol) =>
        carried.withColumn("__ok",
          col("__match_t").isNotNull &&
            (unix_millis(col("__t")) - unix_millis(col("__match_t"))) <= tol)
      case None => carried.withColumn("__ok", col("__match_t").isNotNull)
    }

    val leftOut = lCols.map(c => col("__l").getField(c).as(c))
    val rightOut = rCols.map(c =>
      when(col("__ok"), col("__match").getField(c)).as(c))
    val rtOut = when(col("__ok"), col("__match_t")).as(rightTs)
    withinTol.select(leftOut ++ (rtOut +: rightOut): _*)
  }
}
