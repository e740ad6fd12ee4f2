package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection for LLM-data pipelines (SURVEY.md §2-B q35 +
  * extensions): MinHash band signatures + LSH candidate pairs, SimHash
  * fingerprints, and n-gram (3-shingle) Jaccard similarity.
  *
  * All hash-based ops here use a 60-bit MD5-derived hash (`hash60`) that
  * DuckDB reproduces bit-for-bit, so minhash signatures, LSH candidate
  * pairs and simhash fingerprints all carry full DuckDB oracles on top of
  * the ScalaTest collision/property tests. (An xxhash64-based Simhash64
  * expression also ships — ~2-3x cheaper per token — for deployments that
  * don't need a cross-engine oracle; the LSH structure is identical.)
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
  private val nBands = graft.functions.MinhashFamily.nBands
  private val rowsPerBand = graft.functions.MinhashFamily.rowsPerBand
  private val nHash = nBands * rowsPerBand

  // ---- cross-engine integer mixing over Z_M61 --------------------------
  // The 16-member minhash family is derived from ONE hash60(sh) digest
  // per shingle via a Carter–Wegman affine hash over the Mersenne prime
  // M61 = 2^61 - 1: h_i = (h*A_i + B_i) mod M61 with A_i != 0 — a proper
  // universal family (a prime modulus mixes every bit; mod-2^k families
  // leave low bits unmixed, weakening LSH independence). The mix runs in
  // the native Mix61 expression — NOT raw SQL arithmetic — because h*A
  // overflows a signed Long and ANSI mode (the Spark 4 default) turns
  // that into ARITHMETIC_OVERFLOW; the expression computes the 122-bit
  // product exactly (multiplyHigh + Mersenne folding). The DuckDB twin
  // computes in HUGEINT (int128) and takes % M61 — identical values.
  // The single-digest design replaced 16 md5 digests per shingle (plus a
  // string re-hash per band) after the round-2 bench regression: MD5 is
  // ~10x xxhash-class cost and the string-prefix family paid it 16x.
  // family constants live in graft.functions.MinhashFamily — the ONE
  // source shared with the fused MinhashBands kernel; the SQL
  // formulations here (grouped reference + oracle generation) must use
  // the identical values or LSH buckets silently stop matching.
  private val M61 = graft.functions.Mix61.M61
  private val Mod61 = M61.toString // DuckDB modulus literal
  private val mixA: IndexedSeq[Long] = graft.functions.MinhashFamily.mixA.toIndexedSeq
  private val mixB: IndexedSeq[Long] = graft.functions.MinhashFamily.mixB.toIndexedSeq
  // band fingerprint = sum_r(minhash_r * bandP_r) mod M61 — a nonzero-
  // weight linear combination over the field Z_M61, so distinct signature
  // tuples collide with probability 1/M61 (exact, not heuristic).
  private val bandP: IndexedSeq[Long] = graft.functions.MinhashFamily.bandP.toIndexedSeq

  /** THE canonical whitespace tokenizer over `text` — every batch and
    * streaming text op shares this one definition (cross-query results
    * and streaming/batch parity depend on all sites tokenizing
    * identically; the DuckDB twin is the same explicit class in the
    * oracle SQL). The class is spelled out instead of `\s` because the
    * engines' regex dialects disagree on U+000B: Java's `\s` is
    * `[ \t\n\x0B\f\r]` but DuckDB's RE2 `\s` is `[ \t\n\f\r]` (no
    * vertical tab) — a VT in real corpus text would silently tokenize
    * differently in the two engines, diverging every shingle/minhash/
    * term oracle. The explicit class is Java-`\s`-identical, so the
    * Spark-side semantics are unchanged. */
  val TokExpr: String = "split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+')"

  /** The DuckDB twin of [[TokExpr]] — ONE definition for every oracle
    * SQL site (an ordinary Scala string, so it renders with
    * single-backslash escapes: exactly what a DuckDB string literal
    * passes through to RE2). Interpolate it into `s"""` oracle strings
    * (interpolated VALUES are not escape-processed) or concatenate into
    * plain triple-quoted ones — never re-spell the class by hand: the
    * two string contexts need different backslash depths and a wrong
    * copy silently re-introduces the cross-engine drift. */
  val DuckTokExpr: String =
    "string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')"

  /** Adds the whitespace-token column to any (doc_id, text, ...) frame. */
  def withTok(df: DataFrame): DataFrame =
    df.withColumn("tok", expr(TokExpr))

  private def docs(s: SparkSession, d: String) =
    withTok(Tables.load(s, d, "documents"))

  /** q115's audit stratum: the q54 content-hash keep rule at a 60%
    * rate (first md5 hex char of the text, mod 5, < 3) — deterministic
    * across engines, runs and cluster sizes, exactly the sampler
    * family the 100 TB story names. Exposed (like q139's
    * sampledTrainingInput) so PlanSpec can assert the exact audit arm
    * reads ONLY the stratum: the keep-rule Filter must sit on the
    * documents scan feeding the PPJoin pipeline, which is what makes
    * the exact arm's cost proportional to the stratum, not the corpus. */
  /** The q54-family keep rule behind [[stratumDocs]] — ONE definition,
    * shared with q115's stratum-flag column so the flagged shared
    * stream and the standalone stratum scan can never drift. */
  private[graft] val stratumKeep =
    expr("ascii(substring(md5(text), 1, 1)) % 5 < 3")

  private[graft] def stratumDocs(s: SparkSession, d: String): DataFrame =
    withTok(Tables.load(s, d, "documents").filter(stratumKeep))

  /** 60-bit cross-engine hash: the integer value of the first 15 hex
    * chars of md5(e), via the native Hash60 expression (graft.functions)
    * — digest-direct, no hex round trip. DuckDB twin:
    * `CAST(CAST('0x' || substr(md5(e), 1, 15) AS UBIGINT) AS BIGINT)`.
    * 15 hex chars = 60 bits, so the value is positive in a signed BIGINT
    * in both engines (16 chars could overflow the cast). */
  private def hash60(e: String): String = s"hash60($e)"

  /** (doc_id, band, mh): banded minhash over the doc's distinct 3-shingle
    * set — MAP-ONLY: every minhash is an array_min over the document's
    * own digest array, so signature computation needs ZERO shuffle (the
    * round-4 formulation exploded shingles and grouped per doc, which
    * shuffled one (doc_id, hash) row per shingle — at 100 TB that is
    * hundreds of billions of rows of exchange for a value each mapper
    * can compute locally). ONE hash60 digest per shingle (hoisted — see
    * [[withBandFingerprints]]); each band value is a linear combination
    * of its `rowsPerBand` minhashes, all pure integer arithmetic with an
    * exact DuckDB twin. Documents with no shingles emit no rows (the
    * NULL-fingerprint rows are dropped on the post-Generate attribute,
    * which the optimizer cannot re-inline below the stack). */
  def signaturesOf(docsDf: DataFrame): DataFrame = {
    val bandCols = (0 until nBands)
      .map(b => s"cast($b as bigint), mh$b").mkString(", ")
    withBandFingerprints(docsDf)
      .selectExpr("doc_id", s"stack($nBands, $bandCols) as (band, mh)")
      .filter(col("mh").isNotNull)
  }

  /** Distinct (a_id < b_id) pairs of documents sharing at least one
    * identical minhash band, with the shared-band count — the LSH
    * candidate join shared by q35 (pair listing) and q102 (cluster
    * edges). The groupBy makes the output one row per pair, so callers
    * need no extra distinct. */
  def bandPairsOf(sig: DataFrame): DataFrame = {
    val a = sig.select(col("doc_id").as("a_id"), col("band"), col("mh"))
    val b = sig.select(col("doc_id").as("b_id"), col("band"), col("mh"))
    a.join(b, Seq("band", "mh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_bands"))
  }

  /** The round-4 explode + groupBy formulation of [[signaturesOf]],
    * kept ONLY as the differential-test reference (DedupSpec pins the
    * two bit-identical); production paths use the map-only version. */
  def signaturesOfGrouped(docsDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    val hashed = shingledOf(docsDf)
      .select(col("doc_id"), expr(hash60("sh")).as("h"))
    val aggs = (0 until nHash).map(i =>
      min(expr(s"mix61(h, ${mixA(i)}L, ${mixB(i)}L)")).as(s"h$i"))
    val wide = hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    // band fp = (sum_r h_r * p_r) mod M61 as chained mix61 accumulation:
    // reducing every step equals reducing once (mod is additive).
    val bandCols = (0 until nBands).map { b =>
      val fp = (0 until rowsPerBand).foldLeft("0L") { (acc, r) =>
        s"mix61(h${b * rowsPerBand + r}, ${bandP(r)}L, $acc)"
      }
      s"cast($b as bigint), $fp"
    }
    wide.selectExpr("doc_id",
      s"stack($nBands, ${bandCols.mkString(", ")}) as (band, mh)")
  }

  /** Number of LSH bands in the minhash scheme (shared with the
    * streaming twin so its per-band probe count stays in sync). */
  def numBands: Int = nBands

  /** Map-only per-document band fingerprints as `nBands` columns
    * (mh0..mh3) appended to the input: each minhash is an array_min
    * over the document's OWN shingle-digest array instead of a grouped
    * min over exploded shingle rows (min is duplicate- and
    * order-insensitive, so the two formulations agree exactly —
    * DedupSpec pins bit-parity against [[signaturesOfGrouped]]).
    *
    * Because it needs no aggregation it runs on an unbounded stream
    * (a groupBy would not) and shuffles nothing in batch. The hash60
    * digest array is hoisted into its own projection (`__hs`) so md5
    * runs ONCE per shingle, not once per family member; CollapseProject
    * will not re-inline it into the 16 consumers because the expression
    * is non-cheap and multiply-referenced. Documents with fewer than 3
    * tokens get NULL fingerprints — they have no band rows in the
    * exploded shape either, and NULL never equi-joins, so both shapes
    * treat them as near-dup-immune. */
  def withBandFingerprints(docsDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    // ONE fused native pass (graft.functions.MinhashBands): per 3-gram
    // one MD5 + 16 mix61 against running minima — replaces the layered
    // __hs digest array + 16 array_min(transform(...)) HOF scans (17
    // passes per document, the r7 bench cost). The hoisted __mb array
    // is multiply-referenced and non-cheap, so CollapseProject keeps it
    // a single evaluation, exactly like the old __hs hoist.
    val bandCols = (0 until nBands).map(b =>
      col("__mb").getItem(b).as(s"mh$b"))
    // Parallelism.widen: the fused kernel is the most CPU-expensive
    // per-document map in the library; on a single-row-group fixture
    // file the whole thing would otherwise run as ONE task (streaming
    // frames pass through untouched — micro-batch splits are the
    // source's concern).
    graft.operators.Parallelism.widen(docsDf, col("doc_id"))
      .withColumn("__mb", expr("minhash_bands(tok)"))
      .select(col("*") +: bandCols: _*)
      .drop("__mb")
  }

  /** (doc_id, sh): the doc's distinct 3-token shingles, exploded, via
    * the native Shingles3 expression (one fused loop; the HOF transform/
    * array_distinct chain is CodegenFallback and interpreted ~4 nodes
    * per token).
    *
    * Two optimizer traps are deliberately sidestepped here (both inline
    * the full shingle-construction expression into per-row scan filters,
    * a ~10x slowdown at sf0.1 when it was the HOF chain and still a
    * per-row re-evaluation as a native call):
    *  - plain explode lets InferFiltersFromGenerate derive
    *    `size(sh3) > 0 AND isnotnull(sh3)` and push it below the
    *    projection -> use explode_outer + a cheap attribute filter;
    *  - carrying `size(sh3)` as a projected column lets
    *    InferFiltersFromConstraints rewrite `isnotnull(ns)` back into the
    *    aliased expression -> per-doc counts come from shingleCounts()
    *    (an aggregation boundary) instead.
    */
  def shingledOf(docsDf: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    // `carry` (r16): extra per-document columns to keep alongside the
    // exploded shingles (q115 rides its stratum flag through the shared
    // stream); the default keeps every existing call site's projection
    // — and plan — exactly as before
    docsDf
      .withColumn("sh3", expr("shingles3(tok)"))
      .select(col("doc_id") +: carry.map(col) :+
        explode_outer(col("sh3")).as("sh"): _*)
      .filter(col("sh").isNotNull)
  }

  /** (doc_id, ns): distinct-shingle count per document — corpus
    * cardinality (one row per LIVE doc), so it is joined back by
    * doc_id and never force-broadcast; at fixture scale AQE broadcasts
    * it on its own, at 10^9 docs it shuffles. */
  def shingleCounts(shingles: DataFrame): DataFrame =
    shingles.groupBy("doc_id").agg(count(lit(1)).as("ns"))

  /** ONE row: the corpus's most-shared trigram (max document frequency;
    * ties resolve to the lexicographically largest via max(struct) —
    * fully deterministic). The single source for q113's phrase probe
    * AND [[bm25Terms]], so "the BM25 terms are the words of q113's
    * phrase" holds by construction, not by two hand-synchronized
    * copies of the aggregation. */
  def topTrigram(dd: DataFrame): DataFrame =
    // NOT widened (r15 measurement): this builder is consumed as a
    // 1-row broadcast, often several times per query (q118/q122/q123
    // re-derive it per consumer), and a widen exchange inside each
    // broadcast build cost far more in per-stage overhead than the
    // single-task shingle pass it parallelized (q118 1.22 → 2.39 s,
    // q123 1.07 → 2.34 s at sf0.1/local[32] — reverted)
    shingledOf(dd)
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .agg(max(struct(col("df"), col("sh"))).as("t"))
      .select(col("t").getField("sh").as("phrase"))

  /** The deterministic BM25 query-term set: the distinct words of
    * q113's most-shared trigram ([[topTrigram]]). ONE source for batch
    * q118 and the streaming scorer's serve state, so their parity is by
    * construction. Input: a (doc_id, tok, ...) frame. */
  def bm25Terms(dd: DataFrame): DataFrame =
    topTrigram(dd)
      .select(explode(split(col("phrase"), " ")).as("term"))
      .distinct()

  /** (doc_id, dl, term, tf): per-document term frequencies restricted to
    * the deterministic BM25 query-term set ([[bm25Terms]] — 3 broadcast
    * rows, so the token stream prunes MAP-SIDE; never a corpus-wide
    * score-everything pass). MATERIALIZED: three consumers (scoring,
    * per-term df, q123's relevance grades) read this doc-count-sized
    * table. Shared by q118/q122/q123. */
  private def bm25Tf(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
      .select(col("doc_id"), col("tok"),
        size(col("tok")).cast("bigint").as("dl"))
    val terms = bm25Terms(docs(s, d))
    graft.operators.Materialize.truncate(
      dd.select(col("doc_id"), col("dl"), explode(col("tok")).as("term"))
        .join(broadcast(terms), Seq("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(count(lit(1)).as("tf")))
  }

  /** (doc_id, sc): exact-decimal Okapi BM25 scores (k1 = 1.2, b = 0.75)
    * over [[bm25Tf]] — the un-truncated q118 score table, reused by the
    * q122 fusion arm. Every FP term is the same IEEE expression tree in
    * both engines (double literals only), summed per doc as
    * DECIMAL(28,12) (exact, order-independent); df/avgdl are
    * 1-row/3-row broadcast side tables. */
  private def bm25Scores(s: SparkSession, d: String): DataFrame =
    bm25ScoresFrom(s, d, bm25Tf(s, d))

  /** [[bm25Scores]] over a CALLER-provided tf table — q123 derives both
    * its relevance grades and its ranking from ONE bm25Tf
    * materialization instead of running the term pipeline twice. */
  private def bm25ScoresFrom(s: SparkSession, d: String,
      tf: DataFrame): DataFrame = {
    val dd = docs(s, d)
      .select(col("doc_id"), col("tok"),
        size(col("tok")).cast("bigint").as("dl"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dd.agg(count(lit(1)).as("n"),
      expr("cast(sum(dl) as double) / count(1)").as("avgdl"))
    tf.join(broadcast(dft), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(sum(expr(
        """cast(ln(1e0 + (n - df + 5e-1) / (df + 5e-1))
             * ((tf * 22e-1)
                / (tf + 12e-1 * (25e-2 + 75e-2 * dl / avgdl)))
           as decimal(28,12))""")).as("sc"))
  }

  /** The rank->discount table for q123's DCG@10: disc(r) =
    * floor(1e12 / log2(r+1)) PRECOMPUTED as Scala Long constants and
    * embedded as literals in BOTH the Spark plan and the DuckDB oracle
    * (string-interpolated from this one sequence) — engine log()
    * implementations differ in the last ulp, so the discount curve is
    * pinned as data, the way a real eval job broadcasts its qrels. */
  private val ndcgDiscounts: IndexedSeq[(Int, Long)] =
    (1 to 10).map(r =>
      (r, math.floor(1e12 / (math.log(r + 1.0) / math.log(2.0))).toLong))

  /** The incremental-dedup corpus state as two frames: (distinct exact
    * content hashes `h`, distinct minhash band fingerprints
    * (band, mh)), the shape the streaming twin
    * (streaming.StreamingDedup.corpusState) consumes. DERIVED from
    * [[unifiedDedupState]] — batch q73 reads the unified frame
    * directly, so splitting it here (rather than keeping a second
    * hand-written builder) makes the streaming-batch survivor-parity
    * guarantee structural: any future change to the state definition
    * flows to both sides from the one builder. The post-distinct
    * filters are cheap (the distinct has already shrunk the frame) and
    * cannot change the sets: a NULL equi-join key matched nothing
    * anyway. In production these are incrementally-maintained tables
    * bucketed on their join keys (operators/Bucketing). */
  def dedupState(corpus: DataFrame): (DataFrame, DataFrame) = {
    val u = unifiedDedupState(corpus)
    (u.filter(col("h").isNotNull).select("h"),
      u.filter(col("mh").isNotNull).select("band", "mh"))
  }

  /** The SAME corpus state as [[dedupState]] but as ONE frame from ONE
    * corpus scan: per document, one pass computes the exact content
    * hash AND the band fingerprints, then stacks them into
    * (band, mh, h) rows where each row carries either (band, mh) or h
    * and NULLs for the other side. Both probe joins run against this
    * frame UNFILTERED — an equi-join key that is NULL matches nothing,
    * so the hash rows are invisible to the (band, mh) probe and vice
    * versa. That no-filter shape is load-bearing: a per-consumer
    * `h.isNotNull` filter would be pushed below the distinct (its
    * condition is on a grouping key) and split the two consumers into
    * two different subtrees, i.e. two corpus scans. As written, both
    * consumers share the subtree up through the distinct's exchange, so
    * exchange/stage reuse makes the 100 TB text column read ONCE
    * (PlanSpec pins exactly one corpus-side scan in q73's final plan). */
  def unifiedDedupState(corpus: DataFrame): DataFrame = {
    val perDoc = withBandFingerprints(withTok(corpus))
      .withColumn("h", md5(col("text")))
    val rows = (0 until nBands).map(b =>
      s"cast($b as bigint), mh$b, cast(null as string)") :+
      "cast(null as bigint), cast(null as bigint), h"
    perDoc
      .selectExpr(s"stack(${nBands + 1}, ${rows.mkString(", ")}) as (band, mh, h)")
      .filter(col("mh").isNotNull || col("h").isNotNull)
      .distinct()
  }

  /** 60-bit simhash per document (expects a `tok` column), via the
    * native SimhashMd5 expression (graft.functions) — one fused
    * digest+vote loop per document instead of per-bit lambdas, with an
    * MD5-derived token hash DuckDB reproduces exactly (full oracle). */
  def simhashOf(docsDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    // widen like the minhash/jaccard/docsets kernels: the per-document
    // digest+vote loop is the expensive map here, and a single-row-group
    // input would otherwise plan it as ONE task regardless of cores
    graft.operators.Parallelism.widen(docsDf, col("doc_id"))
      .select(col("doc_id"),
        expr("simhash_md5(tok)").as("simhash"),
        size(col("tok")).cast("long").as("ntok"))
  }

  /** Manku-style block-permutation probe over the 60-bit simhash
    * (Manku, Jain, Das Sarma — "Detecting Near-Duplicates for Web
    * Crawling", WWW 2007): the fingerprint splits into [[SimhashBlocks]]
    * 10-bit blocks; a pair within hamming distance [[SimhashMaxHamming]]
    * dirties at most that many blocks, so it matches EXACTLY on at least
    * `SimhashBlocks - SimhashMaxHamming` = 3 of them. Bucketing on every
    * C(6,3) = 20 three-block combination therefore has provable recall 1
    * for the `hamming <= 3` output — which is why the DuckDB oracle can
    * be the PURE all-pairs `bit_count(xor) <= 3` query with no knowledge
    * of the LSH structure.
    *
    * Why not the old 4×15-bit banding (rounds 2–6): 15-bit bands give
    * 2^15 = 32,768 buckets per band, so the in-bucket candidate
    * generation is ~n²/2^15 pairs per band — at corpus scale (10^9+
    * docs) that degenerates toward all-pairs. Three-block keys are
    * 30 bits wide (2^30 ≈ 1.07e9 buckets): candidates shrink to
    * ~20·n²/2^30, a ~1,600× reduction for 5× the explode factor, and
    * the output gains the recall guarantee the 8-hamming banding never
    * had (8 errors can dirty all 4 bands). The combo id is packed into
    * the low 5 bits of the SAME long join key, so the shuffle carries
    * one 8-byte key column per probe row. */
  val SimhashBlocks = 6
  val SimhashBlockBits = 10
  val SimhashMaxHamming = 3

  private lazy val simhashBlockCombos: Seq[(Seq[Int], Int)] =
    (0 until SimhashBlocks).combinations(SimhashBlocks - SimhashMaxHamming)
      .map(_.toSeq).toSeq.zipWithIndex

  /** All document pairs with simhash hamming distance <= 3 — exact
    * (recall 1) via the block-permutation probe above. Output:
    * (a_id, b_id, hamming), a_id < b_id. */
  def simhashPairsOf(docsDf: DataFrame): DataFrame = {
    val mask = (1 << SimhashBlockBits) - 1
    def block(i: Int): String =
      s"(shiftright(simhash, ${i * SimhashBlockBits}) & $mask)"
    val keyExprs = simhashBlockCombos.map { case (blocks, ci) =>
      val packed = blocks.map(block).reduce((acc, b) =>
        s"(shiftleft($acc, $SimhashBlockBits) | $b)")
      expr(s"(shiftleft($packed, 5) | $ci)")
    }
    val sh = simhashOf(docsDf).select("doc_id", "simhash")
    val keyed = sh.select(col("doc_id"), col("simhash"),
      explode(array(keyExprs: _*)).as("k"))
    val a = keyed.select(col("doc_id").as("a_id"),
      col("simhash").as("ha"), col("k"))
    val b = keyed.select(col("doc_id").as("b_id"),
      col("simhash").as("hb"), col("k"))
    a.join(b, Seq("k"))
      .filter(col("a_id") < col("b_id"))
      // hamming filter BEFORE the pair-dedup shuffle: bit_count(ha^hb)
      // is identical for every combo-duplicate of a pair, so dropping
      // the dissimilar bulk map-side is semantics-preserving — at
      // corpus scale most bucket collisions are hamming > 3 and never
      // deserve the exchange
      .filter(expr(s"bit_count(ha ^ hb) <= $SimhashMaxHamming"))
      .groupBy("a_id", "b_id")
      .agg(min(expr("bit_count(ha ^ hb)")).cast("long").as("hamming"))
  }

  /** Default document-frequency cap for `jaccardPairsOf`: shingles shared
    * by more than this many documents are treated as stop-shingles and
    * excluded from the similarity universe. The fixtures max out at
    * df = 25 (sf0.1), so 100 leaves the oracle-checked results untouched
    * while bounding worst-case behavior. The cap is mirrored literally in
    * the q37/q45/q67 DuckDB oracle SQL — change both together. */
  val DefaultShingleDfCap = 100

  /** Shared-shingle pairs with Jaccard >= threshold.
    *
    * The shingle construction runs ONCE: one shuffle groups doc ids per
    * shingle, pairs are generated in-group (ids arrive sorted from the
    * aggregator, so a < b by construction), and the per-doc set sizes are
    * re-derived from the same grouped data — a self-join formulation
    * would recompute the expensive shingling for each side.
    *
    * In-group pair generation is O(c²) per shingle, so c is bounded by a
    * document-frequency cap: `CappedIdList` stops collecting past
    * dfCap + 1 ids (O(dfCap) reducer memory even for a shingle shared by
    * millions of documents) and returns NULL for over-cap groups, which
    * are dropped. Dropping a stop-shingle removes it from the similarity
    * universe entirely — both intersections and per-doc set sizes (`ns`
    * comes from the same post-cap grouped data), matching the standard
    * stop-shingle-removal semantics and the DuckDB oracle's QUALIFY
    * filter.
    */
  def jaccardPairsOf(docsDf: DataFrame, threshold: Double,
      dfCap: Int = DefaultShingleDfCap): DataFrame = {
    val cappedIds =
      udaf(new graft.functions.CappedIdList(dfCap),
        org.apache.spark.sql.Encoders.scalaLong)
    // The group key is xxhash64(sh), not the shingle string: the shuffle
    // then moves 16 bytes/row instead of ~40 (the dominant cost at
    // corpus scale). Results are identical unless two DISTINCT shingles
    // collide in 64 bits (~n²/2^65 — negligible even at 10^12 shingles),
    // so the DuckDB twin keeps grouping by the string itself.
    val grouped =
      shingledOf(graft.operators.Parallelism.widen(docsDf, col("doc_id")))
      .select(col("doc_id"), xxhash64(col("sh")).as("shk"))
      .groupBy("shk")
      .agg(cappedIds(col("doc_id")).as("ids"))
      .filter(col("ids").isNotNull)
    val counts = grouped
      .select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("ns"))
    // native pair generation (ids arrive sorted from CappedIdList, so
    // a_id < b_id by construction); the nested-transform HOF equivalent
    // interpreted O(c²) lambda trees per group
    //
    // The explicit fixed-N repartition before the generator is a row-
    // explosion guard: AQE rightly coalesces the small grouped-aggregate
    // output (~a few MB) into a handful of reducer partitions, but the
    // generator multiplies rows ~50x, so whatever task count survives
    // coalescing is the task count the pair aggregation runs at —
    // measured 5x slower end-to-end at sf0.1. A user-numbered hash
    // repartition is exempt from AQE coalescing and restores full
    // parallelism for the O(c²) expansion; it moves only the grouped id
    // lists (16 B/doc-instance), not the pair stream.
    grouped.filter(size(col("ids")) > 1)
      .repartition(
        docsDf.sparkSession.sessionState.conf.numShufflePartitions,
        col("shk"))
      .select(explode(expr("pair_combos(ids)")).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"))
      // `counts` is one row per document — corpus cardinality, NOT a
      // bounded dimension. No broadcast() hint: forcing it would hit
      // Spark's broadcast hard limit at the 10^9-doc target (the q73
      // rule: the corpus side is never broadcast). Catalyst/AQE still
      // auto-broadcasts below autoBroadcastJoinThreshold, so fixture-
      // scale plans are unchanged; at scale this is a shuffle join on
      // the already-sub-quadratic pair stream's ids.
      .join(counts.select(col("doc_id").as("a_id"),
        col("ns").as("na")), Seq("a_id"))
      .join(counts.select(col("doc_id").as("b_id"),
        col("ns").as("nb")), Seq("b_id"))
      .withColumn("jac_raw",
        col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jac_raw") >= threshold)
      // threshold filter on the RAW double (long÷long IEEE division is
      // bit-identical across engines); only the PRESENTATION round goes
      // through Det.dratio — a reduced denominator of 2^5·5^b (160,
      // 800, …) terminates at the 5th decimal without being
      // binary-exact, the round(double,4) cross-engine tie case
      .select(col("a_id"), col("b_id"), col("inter"),
        graft.Det.dratio(col("inter"),
          col("na") + col("nb") - col("inter"), 4).as("jac"))
  }

  /** One row per document: its hashed 3-shingle set as both a
    * rarest-first array `os` (prefix-filter order: global df asc, shk
    * tiebreak) and a value-sorted array `osh` (merge-walk verification
    * input) — MATERIALIZED (Materialize.truncate: localCheckpoint by
    * default, durable checkpoint() under
    * spark.graft.reliableCheckpoints). Shared by the q103 exact-Jaccard
    * join and the q124 containment join, whose candidate + verification
    * branches would each re-run the scan -> shingle -> df-join pipeline
    * without it (column pruning specializes each consumer differently,
    * defeating exchange reuse).
    *
    * The numbered repartitions are exempt from AQE coalescing: the shk
    * one keeps the df aggregate + df join at full parallelism, the
    * doc_id one doubles as the doc-set aggregate's required
    * distribution AND the checkpoint's partition layout (without it
    * the small aggregate coalesces to a couple of tasks and every
    * downstream explode/join inherits that serial layout from the
    * materialized blocks). */
  def docsetsOf(s: SparkSession, docsDf: DataFrame): DataFrame = {
    val nPart = s.sessionState.conf.numShufflePartitions
    val sh = shingledOf(
        graft.operators.Parallelism.widen(docsDf, col("doc_id")))
      .select(col("doc_id"), xxhash64(col("sh")).as("shk"))
      .repartition(nPart, col("shk"))
    docsetsFromKeyed(s, sh)
  }

  /** The df-rank + per-doc-array half of [[docsetsOf]] over an
    * already-keyed (doc_id, shk) stream — split out (r16) so q115 can
    * build BOTH its exact arms' docsets (full-corpus df universe and
    * stratum-local df universe) from one shared, materialized shingle
    * stream. Document frequencies are computed over exactly the rows
    * passed in, so a stratum-filtered input yields the same docsets as
    * shingling the stratum from scratch (shingling is per-document). */
  private def docsetsFromKeyed(s: SparkSession, sh: DataFrame): DataFrame = {
    val nPart = s.sessionState.conf.numShufflePartitions
    val dfreq = sh.groupBy("shk").agg(count(lit(1)).as("df"))
    graft.operators.Materialize.truncate(
      sh.join(dfreq, Seq("shk"))
        .repartition(nPart, col("doc_id"))
        .groupBy("doc_id")
        .agg(expr(
          "transform(sort_array(collect_list(struct(df, shk))), x -> x.shk)")
          .as("os"),
          expr("array_sort(collect_list(shk))").as("osh")))
  }

  /** Exact Jaccard >= t pairs via the lossless PPJoin prefix filter —
    * the q103 builder, shared with the q115 recall audit (see the
    * q103 map entry's comment for the full losslessness argument and
    * plan-shape story). Returns (a_id, b_id, inter, jac), a_id < b_id,
    * unordered. */
  def exactJaccardPairsOf(s: SparkSession, docsDf: DataFrame,
      t: Double): DataFrame =
    exactJaccardPairsFromDocsets(docsetsOf(s, docsDf), t)

  /** The pair half of [[exactJaccardPairsOf]] over an
    * already-materialized docsets table — split out (r16) so q115's two
    * exact arms can derive their docsets from ONE shared shingle stream
    * instead of each re-running the scan → tokenize → shingle → hash
    * pipeline (see the q115 entry). */
  private def exactJaccardPairsFromDocsets(docsets: DataFrame,
      t: Double): DataFrame = {
    // both candidate sides explode the CHECKPOINTED docsets —
    // deriving them from `sh` would re-run the scan -> shingle ->
    // hash pipeline again (the checkpoint barrier splits the plan,
    // so within the final job that subtree has no reusable
    // exchange); exploding materialized long arrays costs a
    // fraction of that
    def prefixSide(as: String) = docsets
      .select(col("doc_id").as(as), explode(expr(
        s"slice(os, 1, cast(size(os) - ceil(size(os) * $t) + 1 as int))"))
        .as("shk"))
    // candidates stay UN-deduplicated through verification: the
    // duplication factor (one row per shared prefix shingle, ~1.05
    // here) is far cheaper to carry through the broadcast joins and
    // the merge-walk than a half-second million-key distinct; the
    // final distinct runs on the handful of surviving rows
    val cand = prefixSide("a_id").join(prefixSide("b_id"), Seq("shk"))
      .filter(col("a_id") < col("b_id"))
    cand
      .join(docsets.select(col("doc_id").as("a_id"), col("osh").as("la")),
        Seq("a_id"))
      .join(docsets.select(col("doc_id").as("b_id"), col("osh").as("lb")),
        Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("sorted_intersect_count(la, lb)").as("inter"),
        size(col("la")).as("na"), size(col("lb")).as("nb"))
      .withColumn("jac_raw",
        col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jac_raw") >= t)
      // raw-double filter + Det.dratio presentation (see jaccardPairsOf)
      .select(col("a_id"), col("b_id"), col("inter"),
        graft.Det.dratio(col("inter"),
          col("na") + col("nb") - col("inter"), 4).as("jac"))
      .distinct()
  }

  /** Exact asymmetric CONTAINMENT >= t ordered pairs — C(A,B) =
    * |A∩B| / |A|, the near-SUBSET detector Jaccard misses (a short doc
    * embedded verbatim in a long one scores high containment but low
    * Jaccard because the union is dominated by B). Same lossless
    * prefix-filter family as [[exactJaccardPairsOf]], adapted to the
    * asymmetric measure: C >= t needs inter >= ceil(t·|A|), so if A∩B
    * misses ALL of A's (|A| − ceil(t·|A|) + 1) globally-RAREST shingles
    * the intersection is at most ceil(t·|A|) − 1 — too small. Hence
    * prefix-explode only the contained side; the containing side must
    * index its FULL shingle set (it can never be pruned — any of B's
    * shingles might be the one A's prefix hits), which is the inherent
    * extra cost of containment vs symmetric Jaccard. Candidates still
    * concentrate on rare shingles (the prefix is rarest-first), the
    * probe is one equi-join on shk, and verification is the same
    * merge-walk over the checkpointed doc-level arrays. t must be
    * dyadic (0.75 here) so ceil(size·t) is FP-exact in both engines.
    * Returns ordered (sub_id, sup_id, inter, cont) — both directions
    * can match independently. */
  def containmentPairsOf(s: SparkSession, docsDf: DataFrame,
      t: Double): DataFrame = {
    val docsets = docsetsOf(s, docsDf)
    val subPrefix = docsets.select(col("doc_id").as("sub_id"),
      explode(expr(
        s"slice(os, 1, cast(size(os) - ceil(size(os) * $t) + 1 as int))"))
        .as("shk"))
    val supAll = docsets.select(col("doc_id").as("sup_id"),
      explode(col("os")).as("shk"))
    // UNLIKE q103 (prefix x prefix, duplication ~1.05 — cheaper to
    // carry through), prefix x FULL candidates duplicate once per
    // shared prefix shingle: a true subset pair repeats ~|prefix| ~
    // 0.25·|A| times (~15x here, measured 7.8 s -> ~3 s at sf0.1), so
    // dedup the pair ids BEFORE the verification joins
    subPrefix.join(supAll, Seq("shk"))
      .filter(col("sub_id") =!= col("sup_id"))
      .select("sub_id", "sup_id").distinct()
      .join(docsets.select(col("doc_id").as("sub_id"), col("osh").as("la")),
        Seq("sub_id"))
      .join(docsets.select(col("doc_id").as("sup_id"), col("osh").as("lb")),
        Seq("sup_id"))
      .select(col("sub_id"), col("sup_id"),
        expr("sorted_intersect_count(la, lb)").as("inter"),
        size(col("la")).as("na"))
      .withColumn("cont_raw", col("inter") / col("na"))
      .filter(col("cont_raw") >= t)
      // raw-double filter + Det.dratio presentation (see jaccardPairsOf)
      .select(col("sub_id"), col("sup_id"), col("inter"),
        graft.Det.dratio(col("inter"), col("na"), 4).as("cont"))
  }

  val queries: Map[String, Q] = Map(
    // q35: minhash band signatures (deterministic; property-tested)
    "q35_minhash_sig" -> ((s, d) =>
      signaturesOf(docs(s, d)).orderBy("doc_id", "band")),

    // q35p: LSH candidate pairs — docs sharing >= 1 identical band hash
    "q35_minhash_pairs" -> ((s, d) =>
      bandPairsOf(signaturesOf(docs(s, d))).orderBy("a_id", "b_id")),

    // q36: 64-bit simhash — entirely map-side (one fold per document):
    // per-bit vote counts over token hashes, then bits -> one long
    "q36_simhash" -> ((s, d) => simhashOf(docs(s, d)).orderBy("doc_id")),

    // q37: n-gram (3-shingle) Jaccard similarity over shared-shingle pairs
    "q37_ngram_jaccard" -> ((s, d) =>
      jaccardPairsOf(docs(s, d), 0.5).orderBy("a_id", "b_id")),

    // q68: simhash near-dup pairs, hamming <= 3 EXACTLY — the Manku
    // block-permutation probe (see simhashPairsOf) has provable recall
    // 1, so the oracle is the pure all-pairs bit_count(xor) <= 3 query.
    "q68_simhash_pairs" -> ((s, d) =>
      simhashPairsOf(docs(s, d)).orderBy("a_id", "b_id")),

    // q72: benchmark decontamination — training docs whose 3-shingle
    // sets overlap an evaluation set (here: doc_id < 50 plays the role
    // of the benchmark corpus). The eval shingle set is DISTINCT + tiny
    // by construction (benchmarks are small), so it broadcasts; the
    // train side stays map-local until the per-doc count — the shape
    // that holds when the train corpus is 100 TB and the eval set is MBs.
    // Overlap is exact integer basis points (no FP ties).
    "q72_contamination" -> ((s, d) => {
      val sh = shingledOf(docs(s, d))
      val evalSet = sh.filter(col("doc_id") < 50).select("sh").distinct()
      val train = sh.filter(col("doc_id") >= 50)
      // ONE pass over the train shingles: a broadcast LEFT join against
      // the flagged eval set lets a single aggregate produce both the
      // total (ns) and the overlap (count of non-null flags). The
      // previous semi-join + separate shingleCounts(train) formulation
      // shingled the 100 TB train side twice — the semi join sat
      // between the shingle stream and one aggregate but not the
      // other, so neither exchange reuse nor AQE stage reuse applied.
      // evalSet is distinct, so the left join cannot multiply rows.
      train.join(broadcast(evalSet.withColumn("hit", lit(1))),
          Seq("sh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("ns"), count(col("hit")).as("hit_shingles"))
        .withColumn("contam_bp",
          expr("(hit_shingles * 10000) div ns"))
        .filter(col("contam_bp") >= 2500)
        .select("doc_id", "ns", "hit_shingles", "contam_bp")
        .orderBy("doc_id")
    }),

    // q73: INCREMENTAL dedup — a new batch (doc_id >= 250) deduped
    // against the existing corpus (doc_id < 250): exact-hash anti-join
    // first, then a minhash band-bucket anti-join for near-dups. This is
    // the recurring-ingest production pattern: in deployment the corpus
    // hash/band tables are PRECOMPUTED incremental state (bucketed on
    // their keys — operators/Bucketing — so these joins co-locate with
    // zero shuffle of the corpus); both joins here stay shuffle joins
    // keyed on (h) / (band, mh) because at 100 TB the corpus side is the
    // big one and must never be broadcast.
    "q73_incremental_dedup" -> ((s, d) => {
      val all = docs(s, d)
      val corpus = all.filter(col("doc_id") < 250)
      val batch = all.filter(col("doc_id") >= 250)
      // ONE corpus scan feeds both probes (unifiedDedupState + stage
      // reuse; the NULL halves of each state row are invisible to the
      // other probe's equi-join). The band probe runs over the FULL
      // batch rather than the exact-survivor subset: the extra ids it
      // can emit are exact dups, which the final anti-join against
      // exactNew never sees — same survivors, and signaturesOf no
      // longer re-derives the exact anti-join (which previously
      // rebuilt the corpus-hash subtree a second time).
      // the coalesce sentinels ('' / -1 can never equal an md5 hex
      // string / a mix61 value) make each probe key NON-nullable, so
      // InferFiltersFromConstraints has no IsNotNull(key) to push below
      // the state's distinct — with a nullable key it does exactly
      // that, specializing the two consumers into two different
      // subtrees and forfeiting the single-scan reuse
      val state = unifiedDedupState(corpus)
      val stateH = state.select(coalesce(col("h"), lit("")).as("h"))
      val stateB = state.select(
        coalesce(col("band"), lit(-1L)).as("band"),
        coalesce(col("mh"), lit(-1L)).as("mh"))
      val exactNew = batch.withColumn("h", md5(col("text")))
        .join(stateH, Seq("h"), "left_anti")
      // no .distinct() on the probe hits: the anti-join below tests
      // membership only, and its build-side hashed relation dedupes —
      // a distinct here would be a full extra shuffle of the batch side
      val nearDupIds = signaturesOf(batch)
        .join(stateB, Seq("band", "mh"), "left_semi")
        .select("doc_id")
      exactNew.join(nearDupIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // q67: near-dup CLUSTERS — connected components over the jaccard
    // pair graph (min-label propagation), giving each near-duplicate
    // group a canonical representative. Oracle: DuckDB recursive-CTE
    // transitive closure over the same pairs.
    "q67_dedup_clusters" -> ((s, d) => {
      val edges = jaccardPairsOf(docs(s, d), 0.5).select("a_id", "b_id")
      graft.operators.ConnectedComponents.run(edges, "a_id", "b_id",
          reliable = graft.operators.Materialize.reliable(s))
        .withColumnRenamed("node", "doc_id")
        .orderBy("doc_id")
    }),

    // q102: canonical-document selection — the step AFTER clustering
    // (q67 finds the groups; this decides who survives): every document
    // joins its LSH cluster (minhash band collisions -> connected
    // components; docs with no collision are their own singleton
    // cluster), and each cluster keeps its longest member, ties to the
    // smallest doc_id — "keep the most complete copy" in INTEGER
    // arithmetic (no FP tie risk). The argmax is the q17 max-struct
    // trick (map-side partial agg), not a per-cluster sort window.
    "q102_cluster_canon" -> ((s, d) => {
      val edges = bandPairsOf(signaturesOf(docs(s, d)))
        .select("a_id", "b_id")
      val cl = graft.operators.ConnectedComponents.run(edges, "a_id", "b_id",
          reliable = graft.operators.Materialize.reliable(s))
        .withColumnRenamed("node", "doc_id")
      Tables.load(s, d, "documents").select("doc_id", "n_chars")
        .join(cl, Seq("doc_id"), "left")
        .withColumn("cl_id", coalesce(col("cluster_id"), col("doc_id")))
        .groupBy("cl_id")
        .agg(count(lit(1)).as("n_docs"),
          max(struct(col("n_chars"), (-col("doc_id")).as("neg"))).as("m"))
        .select(col("cl_id").as("cluster_id"), col("n_docs"),
          (-col("m.neg")).as("canon_id"), col("m.n_chars").as("canon_chars"))
        .orderBy("cluster_id")
    }),

    // q103: prefix-filtered set-similarity join (the PPJoin family) —
    // the literature-grade candidate generator for exact Jaccard >= t:
    // order the shingle universe by ascending document frequency
    // (rarest first, ties on the hash — one consistent global order),
    // and probe with only each document's PREFIX of
    // p = n - ceil(t·n) + 1 rarest shingles. The candidate join is
    // prefix-vs-PREFIX (the AllPairs/PPJoin bound): for any pair with
    // Jaccard >= t, the overlap is >= ceil(t·n) on each side, and the
    // RAREST common shingle x must sit in both prefixes — every
    // element of A before x is non-common (x is the minimum common one
    // under the global order), so if x were outside A's prefix then A
    // would hold >= n_a - ceil(t·n_a) + 1 non-common elements, capping
    // the overlap below ceil(t·n_a). Hence the prefix-prefix join is
    // LOSSLESS (the oracle is the plain uncapped exact formulation).
    // Candidates then verify with an exact intersection count
    // restricted to the candidate set. At corpus scale the prefix is
    // the selectivity knob: only the ~(1-t) rarest fraction of each
    // document probes, and high-df stop-shingles land in suffixes, so
    // their buckets never explode — this REPLACES q37's df-cap
    // heuristic with an exactness-preserving bound.
    // Plan shape: the shingle stream is repartitioned by shk ONCE —
    // the df aggregate, the df join, and the candidate join's two
    // prefix sides all sit on that one exchange (AQE reuses it, so the
    // scan+shingle subtree runs once). Per-document state is the
    // document's own shingle set in BOTH orders — rarest-first `os`
    // for the prefix slice, ascending `osh` for verification — and
    // candidate verification is a codegen'd sorted merge walk
    // (sorted_intersect_count), no per-row hash set, no re-join of
    // per-shingle rows.
    "q103_prefix_jaccard" -> ((s, d) =>
      exactJaccardPairsOf(s, docs(s, d), 0.5).orderBy("a_id", "b_id")),

    // q104: triangle count on the near-dup graph — the density signal
    // that distinguishes a tight duplicate CLIQUE (template spam — one
    // canonical survivor) from a drifting CHAIN (successive revisions —
    // each hop may deserve keeping). The scale shape is degree
    // orientation: every edge points from its lower-(degree, id)
    // endpoint to the higher, so wedges enumerate only at each
    // triangle's LOWEST-rank apex and per-apex fan-out is bounded by
    // out-degree <= O(sqrt(m)) — the standard fix for the hub blow-up
    // a naive wedge join hits on skewed graphs. One degree aggregate,
    // one wedge self-join, one closure join.
    "q104_triangles" -> ((s, d) => {
      // four differently-pruned consumers (two degree unions, the
      // orientation join, the closure join) would re-run the
      // scan+shingle+minhash+band-join pipeline each — materialize the
      // pair-count-sized edge list once (the q103/CC precedent; durable
      // under spark.graft.reliableCheckpoints like the others)
      val e = graft.operators.Materialize.truncate(
        bandPairsOf(signaturesOf(docs(s, d))).select("a_id", "b_id"))
      val sym = e.select(col("a_id").as("v")).union(
        e.select(col("b_id").as("v")))
      val deg = sym.groupBy("v").agg(count(lit(1)).as("deg"))
      val oriented = e
        .join(deg.select(col("v").as("a_id"), col("deg").as("da")),
          Seq("a_id"))
        .join(deg.select(col("v").as("b_id"), col("deg").as("db")),
          Seq("b_id"))
        .select(when(
            struct(col("da"), col("a_id")) < struct(col("db"), col("b_id")),
            struct(col("a_id").as("src"), col("b_id").as("dst")))
          .otherwise(struct(col("b_id").as("src"), col("a_id").as("dst")))
          .as("o"))
        .select(col("o.src").as("src"), col("o.dst").as("dst"))
      val wedges = oriented.select(col("src"), col("dst").as("v"))
        .join(oriented.select(col("src"), col("dst").as("w")), Seq("src"))
        .filter(col("v") < col("w"))
      // the v < w filter above makes (v, w) already canonically ordered
      // — matching e's a_id < b_id invariant directly, so the closure
      // probe is a plain two-column equi-join (no least/greatest
      // wrapping on the dominant wedge stream)
      wedges
        .join(e, col("v") === col("a_id") && col("w") === col("b_id"))
        .agg(count(lit(1)).as("n_triangles"))
    }),

    // q115: LSH dedup-recall audit — "measure, don't guess", pointed
    // at the dedup pipeline (q89 is the same honesty knob for ANN):
    // banded-minhash candidate pairs vs the EXACT Jaccard >= t pairs
    // from q103's lossless machinery, as ONE summary row — counts,
    // recall and precision in integer basis points (no FP ties). The
    // expected recall is the banding S-curve 1-(1-s^r)^b, NOT 1 — the
    // audit is what tells an operator whether the curve matches their
    // threshold before they dedup 100 TB with it. The 100 TB form of
    // the exact arm runs AS CODE here (VERDICT r10 task 4, the q139
    // pattern applied to the audit): a SECOND exact arm computes its
    // PPJoin pipeline over ONLY the q54-family content-hash stratum
    // (60% keep — Dedup.stratumDocs; PlanSpec asserts the keep-rule
    // filter sits on that arm's documents scan), so its cost is
    // proportional to the stratum, never the corpus — at 100 TB the
    // full exact arm is unaffordable and recall_strat_bp IS the audit.
    // Both recalls are reported side by side at fixture scale, which
    // is itself the honesty measurement for the stratified estimator.
    // All pair sets are near-dup-sized, so the semi joins and the
    // 1-row aggregate cross-joins (the q88 pattern) are noise next to
    // the pipelines that produce them.
    "q115_dedup_recall" -> ((s, d) => {
      // each pair set feeds TWO consumers (its own count + the hit
      // semi-join); materialize all three so the expensive producing
      // pipelines — the PPJoin verifies and the band self-join — run
      // exactly once. Near-dup-sized state, a rounding error next to
      // the shingle streams behind it.
      //
      // r16: the two exact arms derive their docsets from ONE shared,
      // materialized shingle stream carrying the stratum flag — the
      // full arm and the stratum arm previously each re-ran the whole
      // scan → tokenize → shingles3 → xxhash64 pipeline (DiagStages:
      // the two heaviest stage groups of the query, near-duplicates of
      // each other). Shingling is per-document and each arm's df
      // aggregate runs over exactly its own row universe (stratum df
      // over stratum rows), so both docsets tables are bit-identical
      // to the re-shingled forms (docsetsFromKeyed's contract) and the
      // pair sets — and the oracle hashes — are unchanged. Scale
      // shape: strictly better at 100 TB too — GIVEN the full exact
      // arm already pays the corpus shingle pass, the stratum arm now
      // rides it for one filtered df-aggregate instead of a second
      // corpus scan. (The production stratum-ONLY deployment — where
      // no full arm exists to share with — remains the standalone
      // exactJaccardPairsOf(stratumDocs(..)) composition, whose
      // stratum-proportional scan PlanSpec still pins.)
      val nPart = s.sessionState.conf.numShufflePartitions
      val shF = graft.operators.Materialize.truncate(
        shingledOf(graft.operators.Parallelism.widen(
            docs(s, d).withColumn("strat", stratumKeep), col("doc_id"))
            .select(col("doc_id"), col("strat"), col("tok")),
          carry = Seq("strat"))
          .select(col("doc_id"), col("strat"),
            xxhash64(col("sh")).as("shk"))
          .repartition(nPart, col("shk")))
      val ex = graft.operators.Materialize.truncate(
        exactJaccardPairsFromDocsets(
          docsetsFromKeyed(s, shF.select("doc_id", "shk")), 0.5)
          .select("a_id", "b_id"))
      val lsh = graft.operators.Materialize.truncate(
        bandPairsOf(signaturesOf(docs(s, d)))
          .select("a_id", "b_id"))
      val exS = graft.operators.Materialize.truncate(
        exactJaccardPairsFromDocsets(
          docsetsFromKeyed(s,
            shF.filter(col("strat")).select("doc_id", "shk")), 0.5)
          .select("a_id", "b_id"))
      val hit = lsh.join(ex, Seq("a_id", "b_id"), "left_semi")
      // exS ⊆ stratum×stratum by construction, so this semi-join is
      // already the stratum-restricted recall numerator
      val hitS = lsh.join(exS, Seq("a_id", "b_id"), "left_semi")
      ex.agg(count(lit(1)).as("n_exact"))
        .crossJoin(lsh.agg(count(lit(1)).as("n_lsh_pairs")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .crossJoin(exS.agg(count(lit(1)).as("n_exact_strat")))
        .crossJoin(hitS.agg(count(lit(1)).as("n_hit_strat")))
        .select(col("n_exact"), col("n_lsh_pairs"), col("n_hit"),
          expr("CASE WHEN n_exact = 0 THEN 10000 " +
            "ELSE n_hit * 10000 div n_exact END").as("recall_bp"),
          expr("CASE WHEN n_lsh_pairs = 0 THEN 10000 " +
            "ELSE n_hit * 10000 div n_lsh_pairs END").as("precision_bp"),
          col("n_exact_strat"), col("n_hit_strat"),
          expr("CASE WHEN n_exact_strat = 0 THEN 10000 " +
            "ELSE n_hit_strat * 10000 div n_exact_strat END")
            .as("recall_strat_bp"))
    }),

    // q107: cross-source NEAR-dup overlap — the corpus-forensics matrix
    // that catches mirrored dumps and shared boilerplate BETWEEN
    // sources before they skew a mix: LSH band-collision pairs, each
    // attributed to its (source, source) cell. Exact-hash overlap is
    // the degenerate case (the fixtures have none below sf0.1 — near
    // dups are the signal that actually shows up); the joins to the
    // doc->source map are id-keyed and the pair table is the already
    // sub-quadratic LSH candidate set.
    "q107_source_overlap" -> ((s, d) => {
      val src = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"))
      bandPairsOf(signaturesOf(docs(s, d)))
        .join(src.select(col("doc_id").as("a_id"), col("source").as("s_a")),
          Seq("a_id"))
        .join(src.select(col("doc_id").as("b_id"), col("source").as("s_b")),
          Seq("b_id"))
        .select(least(col("s_a"), col("s_b")).as("sa"),
          greatest(col("s_a"), col("s_b")).as("sb"))
        .groupBy("sa", "sb").agg(count(lit(1)).as("near_dup_pairs"))
        .orderBy("sa", "sb")
    }),

    // q113: phrase search — the inverted-index probe primitive (quote
    // detection / contamination lookup): find the corpus's most-shared
    // trigram (max document frequency; ties resolve to the
    // lexicographically largest, i.e. plain max(struct) — fully
    // deterministic), then every document containing it with its exact
    // occurrence count. The df aggregate shuffles the distinct-shingle
    // stream ONCE (the q37 machinery), the winning phrase is ONE
    // broadcast row, and occurrence counting is a map-only HOF over
    // each document's own token array — index once, probe with a
    // constant, nothing quadratic at any corpus size.
    "q113_phrase_search" -> ((s, d) => {
      val dd = docs(s, d)
      val top = topTrigram(dd)
      dd.crossJoin(broadcast(top))
        .withColumn("n_occ", expr(
          """case when size(tok) < 3 then cast(0 as bigint)
             else cast(size(filter(
               transform(sequence(0, size(tok) - 3),
                 i -> concat_ws(' ', tok[i], tok[i+1], tok[i+2])),
               x -> x = phrase)) as bigint) end"""))
        .filter(col("n_occ") > 0)
        .select(col("doc_id"), col("phrase"), col("n_occ"))
        .orderBy("doc_id")
    }),

    // q118: BM25 ranked retrieval — the RELEVANCE layer on top of
    // q113's probe primitive (Okapi BM25, k1 = 1.2, b = 0.75): query
    // terms are the 3 words of q113's deterministic most-shared
    // trigram, scoring is the textbook idf · tf·(k1+1) / (tf + k1·(1 −
    // b + b·dl/avgdl)) sum. Scale shape: the query terms broadcast
    // (3 rows), so the token stream prunes MAP-SIDE before the only
    // per-doc-term aggregate — the inverted-index probe pattern, never
    // a corpus-wide score-everything pass; df/avgdl are 1-row/3-row
    // broadcast side tables. Every FP term is the same IEEE expression
    // tree in both engines (double literals only — 22e-1 not the
    // DECIMAL literal 2.2), summed per doc as DECIMAL(28,12) (exact,
    // order-independent; the q97 argument), ranked on the exact sum
    // with a doc_id tie-break, rounded only for display.
    "q118_bm25_rank" -> ((s, d) =>
      bm25Scores(s, d)
        .orderBy(col("sc").desc, col("doc_id"))
        .limit(10)
        .select(col("doc_id"),
          round(col("sc").cast("double"), 4).as("score"))),

    // q119: PageRank over the LSH collision graph — the second
    // iterative-BSP graph operator next to ConnectedComponents:
    // centrality on the near-dup graph ranks the documents whose
    // content RADIATES through a corpus (template hubs, syndicated
    // articles) where CC only says who touches whom. Five synchronous
    // iterations of r' = (1-d)/N + d·Σ r(u)/deg(u), d = 0.85, on the
    // symmetric band-collision edge set (sub-quadratic by
    // construction). Every quantity is a SCALED BIGINT (1e12 units,
    // truncating `div`), so five rounds of both engines produce
    // IDENTICAL integers — no FP drift across iteration order — and
    // the DuckDB oracle is the same recurrence unrolled as five CTEs.
    // Only the MULTI-CONSUMER inputs materialize (sym and deg feed all
    // five rounds; durable-checkpoint knob) — the fixed-depth
    // recurrence itself stays ONE lazy lineage, a 5-deep join+agg
    // chain Catalyst/AQE handle in a single job with zero per-round
    // driver actions. That is the deliberate contrast with CC, whose
    // UNBOUNDED convergence loop must truncate and probe every round;
    // a fixed iteration count needs neither. Each round is one join +
    // one aggregate on the node key, and the degree/base constants
    // ride the rows (no per-round broadcast).
    "q119_pagerank" -> ((s, d) => {
      val scale = 1000000000000L
      val edges = bandPairsOf(signaturesOf(docs(s, d)))
        .select("a_id", "b_id")
      val sym = graft.operators.Materialize.truncate(
        edges.select(col("a_id").as("src"), col("b_id").as("dst"))
          .union(edges.select(col("b_id").as("src"),
            col("a_id").as("dst"))))
      val deg = graft.operators.Materialize.truncate(
        sym.groupBy("src").agg(count(lit(1)).as("deg")))
      val nDf = deg.agg(count(lit(1)).as("n"))
      var pr = deg.crossJoin(broadcast(nDf))
        .select(col("src").as("node"), col("deg"),
          expr(s"$scale div n").as("r"),
          expr(s"(15 * ($scale div n)) div 100").as("base"))
      for (_ <- 1 to 5) {
        val contrib = pr.join(sym, col("node") === col("src"))
          .select(col("dst"), expr("r div deg").as("c"), col("base"))
        pr = contrib.groupBy("dst")
          .agg(sum(col("c")).as("cs"), max(col("base")).as("base"))
          .join(deg, col("dst") === col("src"))
          .select(col("dst").as("node"), col("deg"),
            expr("base + (85 * cs) div 100").as("r"), col("base"))
      }
      pr.orderBy(col("r").desc, col("node")).limit(20)
        .select(col("node").as("doc_id"), col("r").as("pr"))
    }),

    // q135: source coverage curve — the submodular data-valuation
    // signal curation uses to rank sources (facility-location style):
    // in deterministic source order, how many NEW distinct 3-shingles
    // does each source contribute beyond every earlier source, vs its
    // own distinct count (own − new = redundancy against the prefix).
    // Shapes: one (source, shk) distinct aggregate (the only
    // corpus-sized shuffle), a min-source-per-shingle aggregate on top
    // of it (first-contributor attribution without any ordered scan),
    // and a cumulative window over the SOURCE-count-bounded summary
    // (~20 rows). All integers.
    "q135_source_coverage" -> ((s, d) => {
      // shingledOf, not an inline explode — the InferFiltersFromGenerate
      // trap (see shingledOf's scaladoc) applies to any new explode site
      val ss = shingledOf(docs(s, d))
        .join(Tables.load(s, d, "documents").select("doc_id", "source"),
          Seq("doc_id"))
        .select(col("source"), xxhash64(col("sh")).as("shk"))
        .distinct()
      val own = ss.groupBy("source").agg(count(lit(1)).as("own_shingles"))
      val nw = ss.groupBy("shk").agg(min(col("source")).as("source"))
        .groupBy("source").agg(count(lit(1)).as("new_shingles"))
      own.join(nw, Seq("source"), "left")
        .na.fill(0L, Seq("new_shingles"))
        .withColumn("cum_new", sum(col("new_shingles")).over(
          Window.orderBy("source")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("source"), col("own_shingles"),
          col("new_shingles"), col("cum_new"))
        .orderBy("source")
    }),

    // q133: bounded k-core peel — the third graph operator next to CC
    // (q67) and PageRank (q119): 3 synchronous peel rounds toward the
    // 2-core of the LSH collision graph (drop nodes with degree < 2,
    // recompute, repeat), isolating documents embedded in DENSE near-dup
    // structure (template farms) from mere pairwise matches. Like
    // PageRank — and deliberately unlike CC's convergence loop — the
    // FIXED round count runs as ONE lazy lineage (3 unrolled
    // degree-aggregate + semi-join rounds, zero per-round driver
    // actions); the oracle unrolls the same 3 rounds as CTEs, and all
    // quantities are exact integers. Only the multi-consumer symmetric
    // edge list materializes (durable-checkpoint knob). A fixpoint
    // k-core would swap the unrolled rounds for CC's loop harness; the
    // bounded form is the honest scale shape when peel depth is a
    // product decision (3 rounds kills >= 99% of shallow tendrils).
    "q133_kcore_peel" -> ((s, d) => {
      val edges = bandPairsOf(signaturesOf(docs(s, d)))
        .select("a_id", "b_id")
      val sym = graft.operators.Materialize.truncate(
        edges.select(col("a_id").as("src"), col("b_id").as("dst"))
          .union(edges.select(col("b_id").as("src"),
            col("a_id").as("dst"))))
      var live = sym
      for (_ <- 1 to 3) {
        val keep = live.groupBy("src").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 2).select("src")
        live = live.join(keep, Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("src", "dst"), Seq("dst"),
            "left_semi")
      }
      live.groupBy("src").agg(count(lit(1)).as("deg"))
        .select(col("src").as("doc_id"), col("deg"))
        .orderBy("doc_id")
    }),

    // q122: reciprocal-rank fusion — HYBRID retrieval, the standard way
    // production search combines a sparse (BM25) and a dense (embedding
    // cosine) arm: rrf = Σ 1/(60 + rank) over the lists a doc appears
    // in. Each arm is ranked by its own PROVEN-exact ordering (BM25 on
    // the exact decimal sum, cosine on the q34 rounded value, doc_id
    // tie-break), cut to 20 by TakeOrderedAndProject (scale-safe), and
    // only THEN ranked by a window — the window input is 20 rows by
    // construction, never the corpus. The fused score is scaled-integer
    // (1e6 div (60+r)): exact BIGINTs in both engines, no FP summation
    // order to disagree on. Doc ids and embedding vec_ids share the id
    // space (the q66 convention).
    "q122_rrf_fusion" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val sparse = bm25Scores(s, d)
        .orderBy(col("sc").desc, col("doc_id")).limit(20)
        .withColumn("r_sparse", row_number()
          .over(Window.orderBy(col("sc").desc, col("doc_id")))
          .cast("bigint"))
        .select(col("doc_id"), col("r_sparse"))
      val e = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").as("emb"))
      val probe = e.filter(col("vec_id") === 0).select(col("emb").as("pe"))
      val dense = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id").as("doc_id"),
          round(expr("cosine_sim(emb, pe)"), 4).as("sim"))
        .orderBy(col("sim").desc, col("doc_id")).limit(20)
        .withColumn("r_dense", row_number()
          .over(Window.orderBy(col("sim").desc, col("doc_id")))
          .cast("bigint"))
        .select(col("doc_id"), col("r_dense"))
      sparse.join(dense, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          expr("coalesce(1000000 div (60 + r_sparse), 0)" +
            " + coalesce(1000000 div (60 + r_dense), 0)"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .select(col("doc_id"), col("r_sparse"), col("r_dense"), col("rrf"))
    }),

    // q123: retrieval-quality eval (nDCG@10 + MRR) of the BM25 ranking
    // — the metric layer a retrieval pipeline reports. Relevance is
    // DETERMINISTIC data, not a judgment call: grade = #distinct query
    // terms the doc contains (0..3, exact integers from the bm25Tf
    // probe). The log2 discount curve is pinned as a 10-row literal
    // table (ndcgDiscounts — engine log() differs in the last ulp, so
    // it ships as data, like a broadcast qrels file), making
    // DCG/IDCG/nDCG pure BIGINT arithmetic. IDCG ranks the CORPUS-wide
    // top-10 relevance grades (TakeOrderedAndProject again), so nDCG is
    // against the true ideal, not the retrieved list reshuffled.
    "q123_ndcg" -> ((s, d) => {
      import s.implicits._
      val discDf = ndcgDiscounts.toDF("rank", "disc")
      val tf = bm25Tf(s, d)
      val rel = tf.groupBy("doc_id").agg(count(lit(1)).as("rel"))
      val ranked = bm25ScoresFrom(s, d, tf)
        .orderBy(col("sc").desc, col("doc_id")).limit(10)
        .withColumn("rank", row_number()
          .over(Window.orderBy(col("sc").desc, col("doc_id"))))
      val dcg = ranked.join(rel, Seq("doc_id"), "left")
        .na.fill(0L, Seq("rel"))
        .join(broadcast(discDf), Seq("rank"))
        .agg(sum(col("rel") * col("disc")).as("dcg"),
          min(when(col("rel") > 0, col("rank"))).as("fh"))
      val idcg = rel.orderBy(col("rel").desc, col("doc_id")).limit(10)
        .withColumn("rank", row_number()
          .over(Window.orderBy(col("rel").desc, col("doc_id"))))
        .join(broadcast(discDf), Seq("rank"))
        .agg(sum(col("rel") * col("disc")).as("idcg"))
      dcg.crossJoin(idcg).select(
        col("dcg"), col("idcg"),
        expr("(10000 * dcg) div idcg").as("ndcg_bp"),
        expr("coalesce(10000 div fh, 0)").as("mrr_bp"))
    }),

    // q124: exact containment pairs — see containmentPairsOf for the
    // asymmetric prefix-filter argument (contained side prunes to its
    // rarest (1-t) fraction, containing side indexes in full).
    "q124_containment" -> ((s, d) =>
      containmentPairsOf(s, docs(s, d), 0.75)
        .orderBy("sub_id", "sup_id")),

    // q125: sorted-neighborhood record linkage — the classic
    // entity-resolution BLOCKING family (sort by key, compare only
    // rank-neighbors within w) none of the shingle/minhash ops cover.
    // The global rank is built scale-safely: ranks are computed
    // PER-BLOCK (window partitioned by the key's first character — ~26
    // parallel partitions whose union order equals the total key order,
    // since the block key is a prefix of the sort key), then shifted by
    // per-block offsets from a prefix sum over the TINY block-count
    // table (the q88 cutpoints pattern: one window over ~26 rows, then
    // broadcast). Neighbor candidates come from ONE equi-join: each row
    // explodes its w successor ranks — no global window, no range scan.
    // Verification is levenshtein <= 3 (identical edit-distance
    // semantics in both engines).
    "q125_sorted_neighborhood" -> ((s, d) => {
      val w = 5
      val names = Tables.load(s, d, "part").select(col("p_name")).distinct()
      val blocked = names.withColumn("blk", substring(col("p_name"), 1, 1))
      val intra = blocked.withColumn("ir", row_number()
        .over(Window.partitionBy("blk").orderBy("p_name")))
      val offsets = blocked.groupBy("blk").agg(count(lit(1)).as("c"))
        .withColumn("off", coalesce(sum(col("c")).over(
          Window.orderBy("blk")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val ranked = intra
        .join(broadcast(offsets.select(col("blk"), col("off"))), Seq("blk"))
        .select(col("p_name"), (col("off") + col("ir")).as("rn"))
      val cand = ranked
        .select(col("p_name").as("a_name"), col("rn").as("ra"))
        .select(col("a_name"),
          explode(expr(s"sequence(ra + 1, ra + $w)")).as("rn"))
      cand.join(ranked.select(col("p_name").as("b_name"), col("rn")),
          Seq("rn"))
        .withColumn("lev",
          levenshtein(col("a_name"), col("b_name")).cast("bigint"))
        .filter(col("lev") <= 3)
        .select(col("a_name"), col("b_name"), col("lev"))
        .orderBy("a_name", "b_name")
    })
  )

  /** DuckDB CTE chain mirroring `jaccardPairsOf`: from a CTE named `src`
    * with (doc_id, tok) columns to a pair-stats CTE `p` (a_id, b_id, na,
    * nb, inter). The QUALIFY filter is the oracle twin of the Spark-side
    * `CappedIdList` document-frequency cap; per-doc set sizes (`ns`) are
    * recomputed post-cap, exactly like the Spark plan. Shared by the
    * q37 / q45 / q67 oracles. */
  /** DuckDB twin of `hash60` (value-identical to the Spark expression). */
  private[queries] def duckHash60(e: String): String =
    s"CAST(CAST('0x' || substr(md5($e), 1, 15) AS UBIGINT) AS BIGINT)"

  /** DuckDB shingle CTE `__s` (doc_id, sh list) from a (doc_id, tok) CTE. */
  private def duckShingleCte(src: String): String =
    s"""__s AS (SELECT doc_id,
             CASE WHEN len(tok) < 3 THEN CAST([] AS VARCHAR[])
                  ELSE list_distinct(list_transform(range(1, len(tok) - 1),
                    i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) END AS sh
             FROM $src)"""

  def duckPairCtes(src: String,
      dfCap: Int = DefaultShingleDfCap): String =
    s"""${duckShingleCte(src)},
        __n0 AS (SELECT doc_id, unnest(sh) AS s FROM __s),
        __nk AS (SELECT doc_id, s FROM __n0
                 QUALIFY count(*) OVER (PARTITION BY s) <= $dfCap),
        __nc AS (SELECT doc_id, count(*) AS ns FROM __nk GROUP BY doc_id),
        __n AS (SELECT k.doc_id, k.s, c.ns
                FROM __nk k JOIN __nc c USING (doc_id)),
        p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.ns AS na,
                     b.ns AS nb, count(*) AS inter
              FROM __n a JOIN __n b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4)"""

  private val docsTokCte =
    s"""t AS (SELECT doc_id,
           $DuckTokExpr AS tok FROM documents)"""

  /** DuckDB CTE chain to the exact-decimal BM25 score table `sc`
    * (doc_id, sc) — the oracle twin of [[bm25Scores]], shared by the
    * q118/q122/q123 oracles (also exposes `tf`, q123's relevance
    * source). */
  private lazy val bm25ScCtes: String =
    s"""$docsTokCte,
        ${duckShingleCte("t")},
        e AS (SELECT doc_id, unnest(sh) AS sh FROM __s),
        dfq AS (SELECT sh, count(*) AS df FROM e GROUP BY sh),
        top AS (SELECT sh AS phrase FROM dfq
                ORDER BY df DESC, sh DESC LIMIT 1),
        terms AS (SELECT DISTINCT unnest(string_split(phrase, ' '))
                    AS term FROM top),
        dl AS (SELECT doc_id, tok, CAST(len(tok) AS BIGINT) AS dl FROM t),
        stats AS (SELECT count(*) AS n,
                    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        tf AS (SELECT doc_id, dl, term, count(*) AS tf
               FROM (SELECT doc_id, dl, unnest(tok) AS term FROM dl) x
               JOIN terms USING (term) GROUP BY 1, 2, 3),
        dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        sc AS (SELECT doc_id,
                 sum(CAST(ln(1e0 + (n - df + 5e-1) / (df + 5e-1))
                   * ((tf * 22e-1)
                      / (tf + 12e-1 * (25e-2 + 75e-2 * dl / avgdl)))
                   AS DECIMAL(28,12))) AS sc
               FROM tf JOIN dft USING (term) CROSS JOIN stats
               GROUP BY doc_id)"""

  val oracle: Map[String, String] = Map(
    "q67_dedup_clusters" ->
      s"""WITH RECURSIVE $docsTokCte,
          ${duckPairCtes("t")},
          edges AS (SELECT a_id, b_id FROM p
                    WHERE inter / (na + nb - inter) >= 0.5),
          sym AS (SELECT a_id AS src, b_id AS dst FROM edges
                  UNION SELECT b_id, a_id FROM edges),
          reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s2.dst FROM reach r JOIN sym s2 ON r.dst = s2.src)
          SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
          FROM reach GROUP BY src ORDER BY doc_id""",

    "q102_cluster_canon" ->
      s"""WITH RECURSIVE sig AS ($minhashSigSql),
          edges AS (SELECT a.doc_id AS a_id, b2.doc_id AS b_id
                    FROM sig a JOIN sig b2
                      ON a.band = b2.band AND a.mh = b2.mh
                        AND a.doc_id < b2.doc_id
                    GROUP BY 1, 2),
          sym AS (SELECT a_id AS src, b_id AS dst FROM edges
                  UNION SELECT b_id, a_id FROM edges),
          reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s2.dst FROM reach r JOIN sym s2 ON r.dst = s2.src),
          cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                 FROM reach GROUP BY src),
          f AS (SELECT d.doc_id,
                  coalesce(cl.cluster_id, d.doc_id) AS cluster_id, d.n_chars
                FROM documents d LEFT JOIN cl USING (doc_id)),
          pick AS (SELECT cluster_id, doc_id, n_chars,
                     row_number() OVER (PARTITION BY cluster_id
                       ORDER BY n_chars DESC, doc_id) AS rn,
                     count(*) OVER (PARTITION BY cluster_id) AS n_docs
                   FROM f)
          SELECT cluster_id, n_docs, doc_id AS canon_id,
            n_chars AS canon_chars
          FROM pick WHERE rn = 1 ORDER BY cluster_id""",

    "q37_ngram_jaccard" ->
      s"""WITH $docsTokCte,
         ${duckPairCtes("t")}
         SELECT a_id, b_id, inter,
                ${graft.Det.sqlDratio("inter", "(na + nb - inter)", 4)}
                  AS jac
         FROM p WHERE inter / (na + nb - inter) >= 0.5
         ORDER BY a_id, b_id""",

    "q107_source_overlap" ->
      s"""WITH sig AS ($minhashSigSql),
          e AS (SELECT a.doc_id AS a_id, b2.doc_id AS b_id
                FROM sig a JOIN sig b2
                  ON a.band = b2.band AND a.mh = b2.mh
                    AND a.doc_id < b2.doc_id
                GROUP BY 1, 2),
          p AS (SELECT least(da.source, db.source) AS sa,
                  greatest(da.source, db.source) AS sb
                FROM e JOIN documents da ON e.a_id = da.doc_id
                       JOIN documents db ON e.b_id = db.doc_id)
          SELECT sa, sb, count(*) AS near_dup_pairs
          FROM p GROUP BY 1, 2 ORDER BY sa, sb""",

    // orientation is a perf device only — the count equals the plain
    // a<b<c three-way join the oracle spells out
    "q104_triangles" ->
      s"""WITH sig AS ($minhashSigSql),
          e AS (SELECT a.doc_id AS a_id, b2.doc_id AS b_id
                FROM sig a JOIN sig b2
                  ON a.band = b2.band AND a.mh = b2.mh
                    AND a.doc_id < b2.doc_id
                GROUP BY 1, 2)
          SELECT count(*) AS n_triangles
          FROM e e1
          JOIN e e2 ON e2.a_id = e1.b_id
          JOIN e e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id""",

    // the prefix filter is lossless, so the oracle is the UNCAPPED
    // exact all-pairs formulation (cap = effectively infinite)
    "q103_prefix_jaccard" ->
      s"""WITH $docsTokCte,
         ${duckPairCtes("t", 1000000000)}
         SELECT a_id, b_id, inter,
                ${graft.Det.sqlDratio("inter", "(na + nb - inter)", 4)}
                  AS jac
         FROM p WHERE inter / (na + nb - inter) >= 0.5
         ORDER BY a_id, b_id""",

    "q72_contamination" ->
      s"""WITH $docsTokCte,
          ${duckShingleCte("t")},
          n0 AS (SELECT doc_id, unnest(sh) AS s FROM __s),
          ev AS (SELECT DISTINCT s FROM n0 WHERE doc_id < 50),
          tr AS (SELECT doc_id, s FROM n0 WHERE doc_id >= 50),
          tot AS (SELECT doc_id, count(*) AS ns FROM tr GROUP BY doc_id),
          hit AS (SELECT doc_id, count(*) AS hit_shingles
                  FROM tr WHERE s IN (SELECT s FROM ev)
                  GROUP BY doc_id)
          SELECT tot.doc_id, tot.ns,
            coalesce(hit.hit_shingles, 0) AS hit_shingles,
            (coalesce(hit.hit_shingles, 0) * 10000) // tot.ns AS contam_bp
          FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
          WHERE (coalesce(hit.hit_shingles, 0) * 10000) // tot.ns >= 2500
          ORDER BY tot.doc_id""",

    "q35_minhash_sig" -> (minhashSigSql + " ORDER BY doc_id, band"),

    "q73_incremental_dedup" ->
      s"""WITH sig AS ($minhashSigSql),
          hh AS (SELECT doc_id, md5(text) AS h FROM documents),
          corpus_h AS (SELECT DISTINCT h FROM hh WHERE doc_id < 250),
          exact_new AS (SELECT doc_id FROM hh WHERE doc_id >= 250
                        AND h NOT IN (SELECT h FROM corpus_h)),
          corpus_bands AS (SELECT DISTINCT band, mh FROM sig
                           WHERE doc_id < 250),
          near_dup AS (SELECT DISTINCT s.doc_id FROM sig s
                       JOIN corpus_bands cb
                         ON s.band = cb.band AND s.mh = cb.mh
                       WHERE s.doc_id >= 250)
          SELECT e.doc_id, d.lang
          FROM exact_new e JOIN documents d USING (doc_id)
          WHERE e.doc_id NOT IN (SELECT doc_id FROM near_dup)
          ORDER BY doc_id""",

    "q35_minhash_pairs" ->
      s"""WITH sig AS ($minhashSigSql)
          SELECT a.doc_id AS a_id, b2.doc_id AS b_id, count(*) AS n_bands
          FROM sig a JOIN sig b2
            ON a.band = b2.band AND a.mh = b2.mh AND a.doc_id < b2.doc_id
          GROUP BY 1, 2 ORDER BY a_id, b_id""",

    // exact side = q103's uncapped formulation; LSH side = q35's band
    // self-join (both already hash-verified on their own entries —
    // this audits their OVERLAP). Stratum arm: the Spark side
    // RECOMPUTES the PPJoin pipeline over only the stratum (that is
    // the 100 TB point — cost ∝ stratum); the oracle instead RESTRICTS
    // the full exact set to pairs with both endpoints in the stratum.
    // The two are equal because the UNCAPPED Jaccard-pair predicate is
    // pairwise (a pair's shingle sets and threshold don't depend on
    // any other document — the df-CAP variant would not have this
    // property, which is why the audit pins dfCap = 1e9), so the
    // compare proves the recomputed arm found exactly the restriction.
    "q115_dedup_recall" ->
      s"""WITH $docsTokCte,
          ${duckPairCtes("t", 1000000000)},
          ex AS (SELECT a_id, b_id FROM p
                 WHERE inter / (na + nb - inter) >= 0.5),
          strat AS (SELECT doc_id FROM documents
                    WHERE ascii(substring(md5(text), 1, 1)) % 5 < 3),
          exs AS (SELECT a_id, b_id FROM ex
                  JOIN strat sa ON ex.a_id = sa.doc_id
                  JOIN strat sb ON ex.b_id = sb.doc_id),
          sig AS ($minhashSigSql),
          lsh AS (SELECT a.doc_id AS a_id, b2.doc_id AS b_id
                  FROM sig a JOIN sig b2
                    ON a.band = b2.band AND a.mh = b2.mh
                      AND a.doc_id < b2.doc_id
                  GROUP BY 1, 2),
          m AS (SELECT
                  (SELECT count(*) FROM ex) AS n_exact,
                  (SELECT count(*) FROM lsh) AS n_lsh_pairs,
                  (SELECT count(*) FROM lsh JOIN ex USING (a_id, b_id))
                    AS n_hit,
                  (SELECT count(*) FROM exs) AS n_exact_strat,
                  (SELECT count(*) FROM lsh JOIN exs USING (a_id, b_id))
                    AS n_hit_strat)
          SELECT n_exact, n_lsh_pairs, n_hit,
            CASE WHEN n_exact = 0 THEN 10000
                 ELSE n_hit * 10000 // n_exact END AS recall_bp,
            CASE WHEN n_lsh_pairs = 0 THEN 10000
                 ELSE n_hit * 10000 // n_lsh_pairs END AS precision_bp,
            n_exact_strat, n_hit_strat,
            CASE WHEN n_exact_strat = 0 THEN 10000
                 ELSE n_hit_strat * 10000 // n_exact_strat
            END AS recall_strat_bp
          FROM m""",

    "q36_simhash" ->
      s"""WITH $docsTokCte,
          $simhashCtes
          SELECT sh.doc_id, sh.simhash, CAST(len(t.tok) AS BIGINT) AS ntok
          FROM sh JOIN t ON sh.doc_id = t.doc_id
          ORDER BY sh.doc_id""",

    "q113_phrase_search" ->
      s"""WITH $docsTokCte,
          ${duckShingleCte("t")},
          e AS (SELECT doc_id, unnest(sh) AS sh FROM __s),
          dfq AS (SELECT sh, count(*) AS df FROM e GROUP BY sh),
          top AS (SELECT sh AS phrase FROM dfq
                  ORDER BY df DESC, sh DESC LIMIT 1),
          occ AS (SELECT t.doc_id, top.phrase,
                    CASE WHEN len(t.tok) < 3 THEN 0 ELSE
                      len(list_filter(list_transform(
                        range(1, len(t.tok) - 1),
                        i -> t.tok[i] || ' ' || t.tok[i+1]
                          || ' ' || t.tok[i+2]),
                        x -> x = top.phrase)) END AS n_occ
                  FROM t CROSS JOIN top)
          SELECT doc_id, phrase, CAST(n_occ AS BIGINT) AS n_occ
          FROM occ WHERE n_occ > 0 ORDER BY doc_id""",

    // q113's phrase pick feeds the term set; the FP expression tree is
    // byte-for-byte the Spark one (double literals, same associativity),
    // ranking is on the exact decimal sum so both engines agree on the
    // top-10 cut and its order
    "q118_bm25_rank" ->
      s"""WITH $bm25ScCtes
          SELECT doc_id, round(CAST(sc AS DOUBLE), 4) AS score
          FROM (SELECT * FROM sc ORDER BY sc DESC, doc_id LIMIT 10) r""",

    // each arm's rank CTE mirrors the Spark TakeOrdered-then-window
    // shape; the fused score is pure BIGINT arithmetic
    "q122_rrf_fusion" ->
      s"""WITH $bm25ScCtes,
          sp AS (SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY sc DESC, doc_id)
                     AS BIGINT) AS r_sparse
                 FROM (SELECT * FROM sc
                       ORDER BY sc DESC, doc_id LIMIT 20) s1),
          dn0 AS (SELECT e2.vec_id AS doc_id,
                    round(list_cosine_similarity(
                      CAST(e2.embedding AS DOUBLE[]),
                      CAST(p.pe AS DOUBLE[])), 4) AS sim
                  FROM embeddings e2,
                       (SELECT embedding AS pe FROM embeddings
                        WHERE vec_id = 0) p
                  WHERE e2.vec_id <> 0),
          dn AS (SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
                     AS BIGINT) AS r_dense
                 FROM (SELECT * FROM dn0
                       ORDER BY sim DESC, doc_id LIMIT 20) s2),
          f AS (SELECT coalesce(sp.doc_id, dn.doc_id) AS doc_id,
                  r_sparse, r_dense,
                  coalesce(1000000 // (60 + r_sparse), 0)
                    + coalesce(1000000 // (60 + r_dense), 0) AS rrf
                FROM sp FULL JOIN dn ON sp.doc_id = dn.doc_id)
          SELECT doc_id, r_sparse, r_dense, rrf
          FROM f ORDER BY rrf DESC, doc_id LIMIT 10""",

    // the discount VALUES are string-interpolated from the SAME Scala
    // constants the Spark plan embeds — the curve is data, not math
    "q123_ndcg" -> {
      val discValues = ndcgDiscounts.map { case (r, v) =>
        s"(CAST($r AS BIGINT), CAST($v AS BIGINT))"
      }.mkString(", ")
      s"""WITH $bm25ScCtes,
          rnk AS (SELECT doc_id,
                    CAST(row_number() OVER (ORDER BY sc DESC, doc_id)
                      AS BIGINT) AS rank
                  FROM (SELECT * FROM sc
                        ORDER BY sc DESC, doc_id LIMIT 10) s1),
          rel AS (SELECT doc_id, count(*) AS rel FROM tf GROUP BY doc_id),
          disc(rank, disc) AS (VALUES $discValues),
          dc AS (SELECT CAST(sum(coalesce(rel.rel, 0) * disc.disc)
                      AS BIGINT) AS dcg,
                   min(CASE WHEN coalesce(rel.rel, 0) > 0
                       THEN rnk.rank END) AS fh
                 FROM rnk LEFT JOIN rel ON rnk.doc_id = rel.doc_id
                 JOIN disc ON disc.rank = rnk.rank),
          irnk AS (SELECT rel,
                     CAST(row_number() OVER (ORDER BY rel DESC, doc_id)
                       AS BIGINT) AS rank
                   FROM (SELECT * FROM rel
                         ORDER BY rel DESC, doc_id LIMIT 10) s2),
          ic AS (SELECT CAST(sum(irnk.rel * disc.disc) AS BIGINT) AS idcg
                 FROM irnk JOIN disc ON disc.rank = irnk.rank)
          SELECT dcg, idcg, (10000 * dcg) // idcg AS ndcg_bp,
            coalesce(10000 // fh, 0) AS mrr_bp
          FROM dc CROSS JOIN ic"""
    },

    // the asymmetric prefix filter is lossless (see containmentPairsOf),
    // so the oracle is the UNCAPPED exact all-ordered-pairs formulation
    "q124_containment" ->
      s"""WITH $docsTokCte,
          ${duckShingleCte("t")},
          n AS (SELECT doc_id, unnest(sh) AS s FROM __s),
          nc AS (SELECT doc_id, count(*) AS ns FROM n GROUP BY doc_id),
          p AS (SELECT a.doc_id AS sub_id, b.doc_id AS sup_id,
                  count(*) AS inter
                FROM n a JOIN n b ON a.s = b.s AND a.doc_id <> b.doc_id
                GROUP BY 1, 2)
          SELECT p.sub_id, p.sup_id, p.inter,
            ${graft.Det.sqlDratio("p.inter", "nc.ns", 4)} AS cont
          FROM p JOIN nc ON nc.doc_id = p.sub_id
          WHERE p.inter / nc.ns >= 0.75
          ORDER BY sub_id, sup_id""",

    // oracle uses the plain single-window global rank — the Spark side's
    // block-rank + offset construction must equal it exactly
    "q125_sorted_neighborhood" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
          r AS (SELECT p_name,
                  CAST(row_number() OVER (ORDER BY p_name) AS BIGINT)
                    AS rn FROM n),
          pr AS (SELECT a.p_name AS a_name, b.p_name AS b_name,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
                 FROM r a JOIN r b
                   ON b.rn > a.rn AND b.rn <= a.rn + 5)
          SELECT a_name, b_name, lev FROM pr
          WHERE lev <= 3 ORDER BY a_name, b_name""",

    // q102's band-collision edges + the same scaled-integer recurrence
    // unrolled as five CTEs: every division is truncating integer
    // division, so both engines produce identical BIGINTs per round
    "q119_pagerank" -> {
      val iters = (1 to 5).map { k =>
        s"""pr$k AS (SELECT g.node, g.deg,
            CAST((SELECT b FROM bs) + (85 * x.cs) // 100 AS BIGINT) AS r
          FROM (SELECT s.dst AS nd, sum(p.r // p.deg) AS cs
                FROM pr${k - 1} p JOIN sym s ON p.node = s.src
                GROUP BY s.dst) x
          JOIN degs g ON g.node = x.nd)"""
      }.mkString(",\n          ")
      s"""WITH sig AS ($minhashSigSql),
          edges AS (SELECT a.doc_id AS a_id, b2.doc_id AS b_id
                    FROM sig a JOIN sig b2
                      ON a.band = b2.band AND a.mh = b2.mh
                        AND a.doc_id < b2.doc_id
                    GROUP BY 1, 2),
          sym AS (SELECT a_id AS src, b_id AS dst FROM edges
                  UNION ALL SELECT b_id, a_id FROM edges),
          degs AS (SELECT src AS node, count(*) AS deg FROM sym
                   GROUP BY src),
          nn AS (SELECT count(*) AS n FROM degs),
          bs AS (SELECT (15 * (1000000000000 // n)) // 100 AS b,
                   1000000000000 // n AS r0 FROM nn),
          pr0 AS (SELECT node, deg,
                    CAST((SELECT r0 FROM bs) AS BIGINT) AS r FROM degs),
          $iters
          SELECT node AS doc_id, r AS pr
          FROM (SELECT * FROM pr5 ORDER BY r DESC, node LIMIT 20) f"""
    },

    // first-contributor attribution = min(source) per distinct
    // shingle. The oracle works on RAW shingle strings — the Spark
    // side's xxhash64 keys are a shuffle compaction whose counts agree
    // under the q103 no-collision assumption
    "q135_source_coverage" ->
      s"""WITH $docsTokCte,
          ${duckShingleCte("t")},
          ss AS (SELECT DISTINCT d.source, n.sh
                 FROM (SELECT doc_id, unnest(sh) AS sh FROM __s) n
                 JOIN documents d USING (doc_id)),
          own AS (SELECT source, count(*) AS own_shingles FROM ss
                  GROUP BY source),
          nw AS (SELECT source, count(*) AS new_shingles FROM
                   (SELECT sh, min(source) AS source FROM ss
                    GROUP BY sh) f
                 GROUP BY source)
          SELECT own.source, own.own_shingles,
            coalesce(nw.new_shingles, 0) AS new_shingles,
            CAST(sum(coalesce(nw.new_shingles, 0))
              OVER (ORDER BY own.source ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_new
          FROM own LEFT JOIN nw USING (source)
          ORDER BY own.source""",

    // the same 3 peel rounds unrolled; `src IN keep AND dst IN keep`
    // is the semi-join pair
    "q133_kcore_peel" -> {
      val rounds = (1 to 3).map { k =>
        s"""k$k AS (SELECT src FROM e${k - 1} GROUP BY src
                    HAVING count(*) >= 2),
            e$k AS (SELECT src, dst FROM e${k - 1}
                    WHERE src IN (SELECT src FROM k$k)
                      AND dst IN (SELECT src FROM k$k))"""
      }.mkString(",\n          ")
      s"""WITH sig AS ($minhashSigSql),
          edges AS (SELECT a.doc_id AS a_id, b2.doc_id AS b_id
                    FROM sig a JOIN sig b2
                      ON a.band = b2.band AND a.mh = b2.mh
                        AND a.doc_id < b2.doc_id
                    GROUP BY 1, 2),
          e0 AS (SELECT a_id AS src, b_id AS dst FROM edges
                 UNION ALL SELECT b_id, a_id FROM edges),
          $rounds
          SELECT src AS doc_id, count(*) AS deg
          FROM e3 GROUP BY src ORDER BY doc_id"""
    },

    // Oracle knows NOTHING about the LSH: the block-permutation probe is
    // recall-1 for hamming <= 3 (pigeonhole over 6 blocks), so any
    // correct implementation matches this brute-force definition.
    "q68_simhash_pairs" ->
      s"""WITH $docsTokCte,
          $simhashCtes
          SELECT a.doc_id AS a_id, b2.doc_id AS b_id,
                 CAST(bit_count(xor(a.simhash, b2.simhash)) AS BIGINT)
                   AS hamming
          FROM sh a JOIN sh b2 ON a.doc_id < b2.doc_id
          WHERE bit_count(xor(a.simhash, b2.simhash)) <= 3
          ORDER BY a_id, b_id"""
  )

  /** DuckDB minhash signature query (doc_id, band, mh) mirroring
    * `signaturesOf`: ONE md5-derived hash60 per shingle, the same
    * Carter–Wegman family (h*A_i + B_i) mod M61 minimized per (doc, i),
    * then the same linear band combination — HUGEINT keeps the 122-bit
    * products exact where Spark uses multiplyHigh + Mersenne folding. */
  private lazy val minhashSigSql: String = {
    val mixValues = (0 until nHash).map(i =>
      s"($i, ${mixA(i)}, ${mixB(i)}, ${bandP(i % rowsPerBand)})")
      .mkString(", ")
    s"""WITH $docsTokCte,
        ${duckShingleCte("t")},
        e AS (SELECT doc_id, unnest(sh) AS sh FROM __s),
        h0 AS (SELECT doc_id, ${duckHash60("sh")} AS h FROM e),
        f(i, a, b, p) AS (VALUES $mixValues),
        h AS (SELECT doc_id, f.i AS i, f.p AS p,
                min(CAST((CAST(h AS HUGEINT) * f.a + f.b) % $Mod61
                  AS BIGINT)) AS mh
              FROM h0 CROSS JOIN f
              GROUP BY doc_id, f.i, f.p),
        bb AS (SELECT doc_id, CAST(i // $rowsPerBand AS BIGINT) AS band,
                 CAST(sum(CAST(mh AS HUGEINT) * p) % $Mod61 AS BIGINT) AS mh
               FROM h GROUP BY doc_id, i // $rowsPerBand)
        SELECT doc_id, band, mh FROM bb"""
  }

  /** DuckDB CTE chain from a (doc_id, tok) CTE `t` to `sh`
    * (doc_id, simhash): per-token hash60, per-bit +-1 votes over the
    * token MULTISET (duplicates count), bit set when votes > 0 —
    * mirroring the SimhashMd5 expression exactly. */
  private lazy val simhashCtes: String =
    s"""e AS (SELECT doc_id, unnest(tok) AS w FROM t),
        hh AS (SELECT doc_id, ${duckHash60("w")} AS h FROM e),
        v AS (SELECT doc_id, r.j AS j,
                sum(CASE WHEN ((h >> CAST(r.j AS INTEGER)) & 1) = 1
                    THEN 1 ELSE -1 END) AS vote
              FROM hh CROSS JOIN range(60) r(j)
              GROUP BY doc_id, r.j),
        sh AS (SELECT doc_id,
                 CAST(sum(CASE WHEN vote > 0
                   THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER))
                   ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
               FROM v GROUP BY doc_id)"""
}
