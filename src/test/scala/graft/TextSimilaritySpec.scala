package graft

import org.apache.spark.sql.functions._

/** Invariant checks for text-analysis and similarity queries over the
  * smoke-SF tables (ratios bounded, determinism, top-k consistency).
  */
class TextSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("quality ratios are bounded in [0, 1]") {
    val q = SparkEntry.queries("q41_quality")(spark, sf)
    val bad = q.filter($"punct_ratio" < 0 || $"punct_ratio" > 1 ||
      $"stop_ratio" < 0 || $"stop_ratio" > 1)
    assert(bad.count() == 0)
  }

  test("langid prediction is a known label") {
    val preds = SparkEntry.queries("q40_langid")(spark, sf)
      .select("pred").distinct().as[String].collect().toSet
    assert(preds.subsetOf(Set("en", "es", "de", "fr", "und")))
  }

  test("fingerprint is deterministic across runs") {
    val a = SparkEntry.queries("q43_fingerprint")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = SparkEntry.queries("q43_fingerprint")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("cosine top-k: sims within [-1, 1] and non-increasing") {
    val sims = SparkEntry.queries("q34_cosine_topk")(spark, sf)
      .select("sim").as[Double].collect().toSeq
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
    assert(sims == sims.sortBy(-_), "top-k must be sorted desc")
  }

  test("IVF ANN results are a subset of brute-force candidates") {
    val brute = SparkEntry.queries("q34_cosine_topk")(spark, sf)
    val ivf = SparkEntry.queries("q39_ann_ivf")(spark, sf)
    // every IVF sim must also be achievable by brute force over all vecs:
    // the IVF top-1 sim can never exceed the brute-force top-1 sim
    val bMax = brute.agg(max($"sim")).head().getDouble(0)
    val iMax = ivf.agg(max($"sim")).head().getDouble(0)
    assert(iMax <= bMax + 1e-9)
  }

  test("IVF-PQ ADC: distances non-decreasing, bounded below by PQ error") {
    val rows = SparkEntry.queries("q116_ivf_pq")(spark, sf).collect()
    assert(rows.length == 5, "the probe's inverted list must hold >= 5 vecs")
    val ds = rows.map(_.getDouble(1)).toSeq
    assert(ds.forall(_ >= 0.0), "ADC distances are sums of squares")
    assert(ds == ds.sorted, "top-k must be sorted by approx distance")
    // codebook members (vec_id < 8) quantize to themselves: if one is
    // in the probe's list, its ADC distance equals the PROBE's table
    // entry sum — which for the probe itself (vec 0, also a codebook
    // entry) is 0; vec 0 is excluded, so no result may be exactly the
    // probe. All ids must be positive and distinct.
    val ids = rows.map(_.getLong(0)).toSeq
    assert(ids.forall(_ > 0) && ids.distinct.length == ids.length)
  }

  test("semantic dedup: keepers are smaller, never themselves dropped") {
    val rows = SparkEntry.queries("q117_semantic_dedup")(spark, sf).collect()
    assert(rows.nonEmpty, "fixture near-dup graph must drop something")
    val dropped = rows.map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(0), "keeper is the component min")
      assert(!dropped.contains(r.getLong(1)),
        "a keeper must survive the dedup it anchors")
    }
  }

  test("multi-probe IVF: recall >= single-probe, cost stays partial") {
    val mp = SparkEntry.queries("q120_multiprobe_ivf")(spark, sf).head()
    val sp = SparkEntry.queries("q89_ann_recall")(spark, sf).head()
    assert(mp.getLong(0) >= sp.getLong(0),
      "probing 5 lists must never find fewer true neighbors than 1 list")
    assert(mp.getLong(2) > 0)
    // 5 of 16 sign buckets: the scan must stay well under the corpus
    val total = Tables.load(spark, sf, "embeddings").count()
    assert(mp.getLong(2) < total,
      "multi-probe must still scan a strict subset of the corpus")
  }

  test("token counts: bpe tokenization never undercounts ws tokens") {
    val q = SparkEntry.queries("q42_token_count")(spark, sf)
    assert(q.filter($"bpe_tokens" < $"ws_tokens").count() == 0)
  }

  test("perplexity buckets: tertiles partition the score line in order") {
    val rows = SparkEntry.queries("q126_perplexity_buckets")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet.subsetOf(Set("head", "middle", "tail")))
    assert(rows.nonEmpty)
    // buckets are value intervals: ordering must be strict between them
    for {
      (lo, hi) <- Seq("tail" -> "middle", "middle" -> "head")
      l <- rows.get(lo); h <- rows.get(hi)
    } assert(l._3 < h._2, s"$lo max must sit below $hi min")
    // the tertile split covers every scored doc
    val scored = SparkEntry.queries("q97_bigram_lm")(spark, sf).count()
    assert(rows.values.map(_._1).sum == scored)
  }

  test("dsir weights: ranked desc and the target domain dominates") {
    val q = SparkEntry.queries("q127_dsir_weights")(spark, sf)
    val rows = q.collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val ws = rows.map(_.getDouble(2)).toSeq
    assert(ws == ws.sorted.reverse, "importance-ranked descending")
    // the en-trained target model must prefer its own domain: en docs
    // hold the majority of the top-weight pool
    val langOf = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val enShare = rows.count(r => langOf(r.getLong(0)) == "en")
    assert(enShare * 2 > rows.length,
      s"en docs must dominate the pool: $enShare/${rows.length}")
  }

  test("repetition: dup_bp is exact integer basis points, bounded") {
    val q = SparkEntry.queries("q70_repetition")(spark, sf)
    assert(q.filter($"dup_bp" < 0 || $"dup_bp" > 10000).count() == 0)
    assert(q.filter($"d3" > $"n3").count() == 0)
    // invariant: dup_bp == floor((n3 - d3) * 10000 / n3) for n3 > 0
    assert(q.filter($"n3" > 0 &&
      $"dup_bp" =!= expr("((n3 - d3) * 10000) div n3")).count() == 0)
    // the fixture corpus has a 31-word vocab, so repetition must exist
    assert(q.filter($"dup_bp" > 0).count() > 0)
  }

  test("int8 quantization: values in [-127, 127], max magnitude hit") {
    // q_csv is the driver-sortable CSV form; reparse it for the checks
    val q = SparkEntry.queries("q71_embed_quantize")(spark, sf)
      .withColumn("qv",
        expr("transform(split(q_csv, ','), s -> cast(s as int))"))
    val bad = q.filter(expr(
      "exists(qv, v -> v IS NULL OR v < -127 OR v > 127)")).count()
    assert(bad == 0, "quantized values must fit int8 symmetric range")
    // the element at max |v| must quantize to exactly +-127
    val noPeak = q.filter($"maxabs" > 0)
      .filter(!expr("exists(qv, v -> abs(v) = 127)")).count()
    assert(noPeak == 0, "every nonzero vector must reach the scale peak")
  }
}
