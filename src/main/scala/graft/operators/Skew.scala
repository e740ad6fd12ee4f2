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
    * The salt is derived from ROW CONTENT — xxhash64 over EVERY
    * hashable column plus the seed — never from a non-deterministic
    * expression like monotonically_increasing_id: when a lost shuffle
    * partition forces a map-task recompute, content-hash salts
    * reproduce exactly, so reducers that already fetched the first
    * attempt's output agree with the retry (the SPARK-23207 failure
    * class). The salt SOURCE is chosen by what the specs consume
    * (r14, refining the r13 fix; tightened r15 per ADVICE): when at
    * least one aggregate input is ADMISSIBLE — live (non-literal),
    * DETERMINISTIC (a non-deterministic input like v + rand() hashed
    * into the salt would itself break the retry agreement the
    * content-hash rule exists for), referencing at least one NON-KEY
    * column (an expression over key columns alone is constant within
    * a hot key: hashing it yields one salt per key and silently
    * no-ops the mitigation — min/max OVER A KEY is the real case),
    * and hashable — the salt hashes keys + those inputs only:
    * hashing every column per row is a real CPU cost on wide rows
    * with large binary payloads (media content bytes), and the
    * aggregate inputs are exactly the values that vary inside a hot
    * key for the aggregates being computed. When NO input is
    * admissible (count-only, key-subsumed, or non-deterministic
    * specs), the salt falls back to every hashable column.
    * MapType-bearing columns are excluded everywhere (Spark bans
    * hashing maps since 3.0). Residual trade-offs: rows identical
    * in every salted column share a salt — aggregation stays
    * correct (phase 2 merges all salts), only such duplicate hot
    * rows spread across fewer than saltBuckets reducers; and a
    * LOW-CARDINALITY admissible input (min over a status column)
    * spreads a hot key over only #distinct-values buckets — callers
    * aggregating low-cardinality inputs on known-hot keys should
    * pass explicit high-cardinality `saltCols` (timestamps, ids)
    * instead of relying on the inferred source. */
  /** Can xxhash64 take this type? MapType is banned anywhere in the
    * tree (Spark 3.0+). Shared with AsOfJoin's tie-break hash. */
  private[graft] def hashableType(
      t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case _: org.apache.spark.sql.types.MapType => false
    case st: org.apache.spark.sql.types.StructType =>
      st.fields.forall(f => hashableType(f.dataType))
    case at: org.apache.spark.sql.types.ArrayType =>
      hashableType(at.elementType)
    case _ => true
  }

  /** Is `c` constant with respect to `df` — i.e. does it reference no
    * columns? Probed by resolving against a zero-column frame (Spark
    * 4's Column is plan-free, so there is no public foldability
    * check). Column-free non-deterministic expressions (rand()) also
    * resolve and are thus treated as constant — correct here: hashing
    * one into the salt would break retry determinism (SPARK-23207). */
  private def isConstant(df: DataFrame, c: Column): Boolean =
    try { df.sparkSession.emptyDataFrame.select(c).schema; true }
    catch { case scala.util.control.NonFatal(_) => false }

  /** Is `c` admissible to the inferred salt (policy above):
    * deterministic AND referencing at least one non-key column. Probed
    * on the ANALYZED single-column plan — Spark 4's Column is
    * plan-free, so determinism/references are only visible after
    * resolution against `df`. Key-name comparison follows Spark's
    * default case-insensitive resolution. Unresolvable columns are
    * inadmissible (the aggregation itself will surface the error). */
  private def saltAdmissible(df: DataFrame, keys: Seq[String],
      c: Column): Boolean =
    try {
      val e = df.select(c).queryExecution.analyzed.expressions.head
      e.deterministic && e.references.exists(a =>
        !keys.exists(_.equalsIgnoreCase(a.name)))
    } catch { case scala.util.control.NonFatal(_) => false }

  /** The salt's input columns per the policy above — factored out so
    * tests can pin the choice (keys+inputs vs all-columns fallback). */
  private[graft] def saltSource(df: DataFrame, keys: Seq[String],
      specs: Seq[AggSpec]): Seq[Column] = {
    val live = specs.map(_.input).filterNot(c => isConstant(df, c))
      .filter(c => saltAdmissible(df, keys, c))
    val hashableLive =
      if (live.isEmpty) Nil
      else df.select(live: _*).schema.fields.map(_.dataType).toSeq
        .zip(live).collect { case (t, c) if hashableType(t) => c }
    if (hashableLive.nonEmpty) keys.map(col) ++ hashableLive
    else df.schema.fields
      .filter(f => hashableType(f.dataType)).map(f => col(f.name)).toSeq
  }

  /** `saltCols`, when non-empty, REPLACES the inferred salt source
    * with keys ++ saltCols — the documented escape hatch for hot keys
    * whose admissible aggregate inputs are low-cardinality (the salt
    * then spreads over the caller's high-cardinality payload columns
    * instead). Callers own determinism there: pass plain deterministic
    * columns, never rand()-bearing expressions (SPARK-23207). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      specs: Seq[AggSpec], seed: Long = 42L,
      saltCols: Seq[Column] = Nil): DataFrame = {
    val saltSrc =
      if (saltCols.nonEmpty) keys.map(col) ++ saltCols
      else saltSource(df, keys, specs)
    val salted = df.withColumn("__salt",
      pmod(xxhash64((saltSrc :+ lit(seed)): _*), lit(saltBuckets)))
    saltedPhase1(salted, keys, specs)
      .groupBy(keys.map(col): _*)
      .agg(aggExprs(specs, phase1 = false).head,
        aggExprs(specs, phase1 = false).tail: _*)
  }

  /** Phase 1 alone (per-(keys, salt) partial aggregates) — factored
    * out so tests can observe the SPREAD (distinct salts per hot key),
    * the property the operator exists for. */
  private[graft] def saltedPhase1(salted: DataFrame, keys: Seq[String],
      specs: Seq[AggSpec]): DataFrame =
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggExprs(specs, phase1 = true).head,
        aggExprs(specs, phase1 = true).tail: _*)

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
