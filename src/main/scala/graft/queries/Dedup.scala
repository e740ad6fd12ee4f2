package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection for LLM-data pipelines (SURVEY.md §2-B q35 +
  * extensions): MinHash band signatures + LSH candidate pairs, SimHash
  * fingerprints, and n-gram (3-shingle) Jaccard similarity.
  *
  * MinHash/SimHash build on xxhash64, which has no DuckDB twin, so those
  * are verified by ScalaTest property tests (exact duplicates must
  * collide on every band / have identical simhash — see DedupSpec); the
  * shingle-Jaccard query has a full DuckDB oracle.
  *
  * Scale shape: signatures are map-only per document; candidate pairing
  * shuffles on (band, hash) — the classic LSH band-bucket join that keeps
  * near-dup detection linear-ish in corpus size instead of O(n²).
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  // 4 bands x 4 hashes: P(candidate) = 1 - (1 - j^4)^4 — steep S-curve
  // around j ~ 0.6, so random same-vocab docs (j ~ 0.2-0.4) rarely pair
  // while true near-dups (j > 0.8) almost always do.
  private val nBands = 4
  private val rowsPerBand = 4

  /** Adds the whitespace-token column to any (doc_id, text, ...) frame. */
  def withTok(df: DataFrame): DataFrame =
    df.withColumn("tok", expr("split(trim(text), '\\\\s+')"))

  private def docs(s: SparkSession, d: String) =
    withTok(Tables.load(s, d, "documents"))

  /** (doc_id, band, mh): banded minhash over the doc's distinct 3-shingle
    * set. Each band value hashes `rowsPerBand` independent minhashes
    * together, all computed in one grouped pass (map-side partial min). */
  def signaturesOf(docsDf: DataFrame): DataFrame = {
    val exploded = shingledOf(docsDf).select(col("doc_id"), col("sh"))
    val nHash = nBands * rowsPerBand
    val aggs = (0 until nHash).map(i =>
      min(xxhash64(lit(i), col("sh"))).as(s"h$i"))
    val wide = exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val bandCols = (0 until nBands).map { b =>
      val hs = (0 until rowsPerBand).map(r => s"h${b * rowsPerBand + r}")
      s"cast($b as bigint), xxhash64(${hs.mkString(", ")})"
    }
    wide.selectExpr("doc_id",
      s"stack($nBands, ${bandCols.mkString(", ")}) as (band, mh)")
  }

  /** (doc_id, sh): the doc's distinct 3-token shingles, exploded.
    *
    * Two optimizer traps are deliberately sidestepped here (both inline
    * the full shingle-construction expression — split + transform +
    * array_distinct — into per-row scan filters, a ~10x slowdown at
    * sf0.1):
    *  - plain explode lets InferFiltersFromGenerate derive
    *    `size(sh3) > 0 AND isnotnull(sh3)` and push it below the
    *    projection -> use explode_outer + a cheap attribute filter;
    *  - carrying `size(sh3)` as a projected column lets
    *    InferFiltersFromConstraints rewrite `isnotnull(ns)` back into the
    *    aliased expression -> per-doc counts come from shingleCounts()
    *    (an aggregation boundary) instead.
    */
  def shingledOf(docsDf: DataFrame): DataFrame =
    docsDf
      .withColumn("sh3", expr(
        """case when size(tok) < 3 then array()
           else array_distinct(transform(sequence(1, size(tok) - 2),
             i -> concat_ws(' ', element_at(tok, i), element_at(tok, i + 1),
                            element_at(tok, i + 2)))) end"""))
      .select(col("doc_id"), explode_outer(col("sh3")).as("sh"))
      .filter(col("sh").isNotNull)

  /** (doc_id, ns): distinct-shingle count per document — tiny (one row
    * per doc), broadcast into the pair join. */
  def shingleCounts(shingles: DataFrame): DataFrame =
    shingles.groupBy("doc_id").agg(count(lit(1)).as("ns"))

  /** 64-bit simhash per document (expects a `tok` column), via the
    * native Simhash64 expression (graft.functions) — one fused loop per
    * document instead of 64 interpreted lambdas per token. */
  def simhashOf(docsDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    docsDf.select(col("doc_id"),
      expr("simhash64(tok)").as("simhash"),
      size(col("tok")).cast("long").as("ntok"))
  }

  /** Shared-shingle pairs with Jaccard >= threshold.
    *
    * The shingle construction runs ONCE: one shuffle groups doc ids per
    * shingle, pairs are generated in-group (ids are sorted, so a < b by
    * construction), and the per-doc set sizes are re-derived from the
    * same grouped data — a self-join formulation would recompute the
    * expensive shingling for each side. In-group pair generation is
    * O(c²) per shingle; at 100 TB a stop-shingle document-frequency cap
    * bounds c (the groups here max out at c=25).
    */
  def jaccardPairsOf(docsDf: DataFrame, threshold: Double): DataFrame = {
    val grouped = shingledOf(docsDf)
      .groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    val counts = grouped
      .select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("ns"))
    grouped.filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ids) - 2),
             i -> transform(sequence(i + 1, size(ids) - 1),
               j -> struct(ids[i] AS a_id, ids[j] AS b_id))))""")).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(counts.select(col("doc_id").as("a_id"),
        col("ns").as("na"))), Seq("a_id"))
      .join(broadcast(counts.select(col("doc_id").as("b_id"),
        col("ns").as("nb"))), Seq("b_id"))
      .withColumn("jac_raw",
        col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jac_raw") >= threshold)
      .select(col("a_id"), col("b_id"), col("inter"),
        round(col("jac_raw"), 4).as("jac"))
  }

  val queries: Map[String, Q] = Map(
    // q35: minhash band signatures (deterministic; property-tested)
    "q35_minhash_sig" -> ((s, d) =>
      signaturesOf(docs(s, d)).orderBy("doc_id", "band")),

    // q35p: LSH candidate pairs — docs sharing >= 1 identical band hash
    "q35_minhash_pairs" -> ((s, d) => {
      val sig = signaturesOf(docs(s, d))
      val a = sig.select(col("doc_id").as("a_id"), col("band"), col("mh"))
      val b = sig.select(col("doc_id").as("b_id"), col("band"), col("mh"))
      a.join(b, Seq("band", "mh"))
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("n_bands"))
        .orderBy("a_id", "b_id")
    }),

    // q36: 64-bit simhash — entirely map-side (one fold per document):
    // per-bit vote counts over token hashes, then bits -> one long
    "q36_simhash" -> ((s, d) => simhashOf(docs(s, d)).orderBy("doc_id")),

    // q37: n-gram (3-shingle) Jaccard similarity over shared-shingle pairs
    "q37_ngram_jaccard" -> ((s, d) =>
      jaccardPairsOf(docs(s, d), 0.5).orderBy("a_id", "b_id")),

    // q68: simhash LSH candidates — the 64-bit fingerprint split into 4
    // 16-bit bands; docs sharing any band value are candidates, then
    // filtered by full hamming distance <= 8. Map-only signatures + a
    // band-bucket join (no oracle: xxhash64-based; exact-dup collision
    // asserted in DedupSpec).
    "q68_simhash_pairs" -> ((s, d) => {
      val sh = simhashOf(docs(s, d)).select("doc_id", "simhash")
      val bands = sh.select(col("doc_id"), col("simhash"),
        explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bv",
          expr("shiftright(simhash, cast(band * 16 as int)) & 65535"))
      val a = bands.select(col("doc_id").as("a_id"),
        col("simhash").as("ha"), col("band"), col("bv"))
      val b = bands.select(col("doc_id").as("b_id"),
        col("simhash").as("hb"), col("band"), col("bv"))
      a.join(b, Seq("band", "bv"))
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(min(expr("bit_count(ha ^ hb)")).as("hamming"))
        .filter(col("hamming") <= 8)
        .orderBy("a_id", "b_id")
    }),

    // q67: near-dup CLUSTERS — connected components over the jaccard
    // pair graph (min-label propagation), giving each near-duplicate
    // group a canonical representative. Oracle: DuckDB recursive-CTE
    // transitive closure over the same pairs.
    "q67_dedup_clusters" -> ((s, d) => {
      val edges = jaccardPairsOf(docs(s, d), 0.5).select("a_id", "b_id")
      graft.operators.ConnectedComponents.run(edges, "a_id", "b_id")
        .withColumnRenamed("node", "doc_id")
        .orderBy("doc_id")
    })
  )

  /** Shared oracle fragment: the q37 pair CTEs (shingles -> pairs). */
  private val pairCtes =
    """t AS (SELECT doc_id,
           string_split_regex(trim(text), '\s+') AS tok FROM documents),
      s AS (SELECT doc_id,
           CASE WHEN len(tok) < 3 THEN CAST([] AS VARCHAR[])
                ELSE list_distinct(list_transform(range(1, len(tok) - 1),
                  i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) END AS sh
           FROM t),
      n AS (SELECT doc_id, len(sh) AS ns, unnest(sh) AS s FROM s),
      p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.ns AS na,
                   b.ns AS nb, count(*) AS inter
            FROM n a JOIN n b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4),
      edges AS (SELECT a_id, b_id FROM p
                WHERE inter / (na + nb - inter) >= 0.5)"""

  val oracle: Map[String, String] = Map(
    "q67_dedup_clusters" ->
      s"""WITH RECURSIVE $pairCtes,
          sym AS (SELECT a_id AS src, b_id AS dst FROM edges
                  UNION SELECT b_id, a_id FROM edges),
          reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s2.dst FROM reach r JOIN sym s2 ON r.dst = s2.src)
          SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
          FROM reach GROUP BY src ORDER BY doc_id""",

    "q37_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id,
              string_split_regex(trim(text), '\s+') AS tok FROM documents),
         s AS (SELECT doc_id,
              CASE WHEN len(tok) < 3 THEN CAST([] AS VARCHAR[])
                   ELSE list_distinct(list_transform(range(1, len(tok) - 1),
                     i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) END AS sh
              FROM t),
         n AS (SELECT doc_id, len(sh) AS ns, unnest(sh) AS s FROM s),
         p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.ns AS na,
                      b.ns AS nb, count(*) AS inter
               FROM n a JOIN n b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2, 3, 4)
         SELECT a_id, b_id, inter,
                round(inter / (na + nb - inter), 4) AS jac
         FROM p WHERE inter / (na + nb - inter) >= 0.5
         ORDER BY a_id, b_id"""
  )
}
