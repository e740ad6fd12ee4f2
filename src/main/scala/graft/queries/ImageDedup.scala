package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.pipeline.{ImageOps, ImageRecord}

/** Pixel-space image near-duplicate detection — the multimodal dedup
  * operator (q147/q148): 64-bit dHash (graft.functions.DHash64) over
  * decoded pixels, near-dup pairs by banded hash-prefix grouping (the
  * q36/q68 simhash block-key pattern) verified by Hamming distance.
  * A LAION-style curation pipeline needs exactly this on day one:
  * resized/re-encoded copies defeat exact byte dedup (q32's md5 keeps
  * both), and no embedding model exists offline — gradient-sign
  * hashes are the content key that survives re-encoding
  * (ImagePipelineSpec pins jpeg-q95/resize robustness on real decoded
  * fixtures).
  *
  * Unlike the rest of the media surface, BOTH queries are
  * DuckDB-ORACLED — the multimodal family's first hash-matched
  * entries. The corpus is formula-pinned (integer middle-square mix,
  * the JlProject.sign discipline), the Spark side runs it through a
  * REAL encode->decode roundtrip (PNG is lossless, so decoded pixels
  * == the formula; the decode stage is the reference's own,
  * /root/reference/src/piper/spark/data_augment.py:42-60), and the
  * oracle replays pixels -> grayscale -> 9x8 cells -> gradient bits ->
  * packed BIGINT in pure integer SQL. q148's oracle is deliberately
  * the EXACT all-pairs `bit_count(xor) <= 3` query (the q68
  * precedent): with 4 bands of 16 bits, pigeonhole guarantees any
  * pair within Hamming 3 shares an untouched band, so the banded
  * Spark plan must reproduce exact semantics — the oracle checks the
  * recall proof, not just the arithmetic.
  *
  * 100 TB shape: the hash is one map-side pass per image (no shuffle);
  * candidates shuffle once on the (band, value) key — buckets are
  * hash-sized (2^16 values per band position over content-hash-like
  * bits), so the self-join never goes all-pairs; verification is O(1)
  * per candidate. The same plan class as minhash-LSH (q35), with the
  * signature computed from pixels instead of shingles.
  */
object ImageDedup {
  type Q = (SparkSession, String) => DataFrame

  /** Corpus constants — mirrored VERBATIM by the oracle SQL. */
  private val nImages = 120
  private val side = 32 // 32x32, 3 channels
  private val channels = 3

  /** Deterministic pixel formula: a middle-square mix per (image,
    * byte) — pseudorandom textures, so distinct images land in
    * distinct LSH buckets (a linear ramp would alias every image's
    * gradient signs). Every 3rd image (i % 3 == 2) is a NEAR-DUP of
    * its predecessor: same base texture, +5 on every 97th byte —
    * measured Hamming <= 2 on the fixture (pinned in
    * ImagePipelineSpec). Base values stay under 251, so the +5 can
    * never wrap a byte. */
  private[graft] def rawPixels(i: Long): Array[Byte] = {
    val a = if (i % 3 == 2) i - 1 else i
    val out = new Array[Byte](side * side * channels)
    var p = 0
    while (p < out.length) {
      val h = (a * 1000003L + p * 7919L + 12345L) % 1048576L
      var v = ((h * h) >> 7) % 251L
      if (i % 3 == 2 && p % 97 == 0) v += 5
      out(p) = v.toByte
      p += 1
    }
    out
  }

  /** The decoded corpus: formula pixels -> PNG encode -> REAL ImageIO
    * decode (lossless roundtrip) -> (img_id, data, w, h, c). Generated
    * distributed from the row id like q44/q138 — no driver-side
    * materialization. */
  private[graft] def decodedCorpus(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(0, nImages).as[Long].flatMap { i =>
      val rec = ImageRecord(s"mem://neardup/$i", side, side, channels,
        16, rawPixels(i))
      ImageOps.decodeEncoded(rec.origin, ImageOps.pngEncode(rec))
        .map(d => (i, d.data, d.width, d.height, d.nChannels))
    }.toDF("img_id", "data", "w", "h", "c")
  }

  /** (img_id, dhash) over the decoded corpus — one codegen'd map pass. */
  private[graft] def hashesOf(s: SparkSession): DataFrame = {
    GraftFunctions.register(s)
    decodedCorpus(s)
      .select(col("img_id"), expr("dhash64(data, w, h, c)").as("dhash"))
  }

  /** Near-dup pairs: 4 bands of 16 bits each -> bucket self-join ->
    * distinct pairs -> Hamming <= 3 verify. `(h >> s) & 65535` is
    * fill-independent (s <= 48), so arithmetic vs logical shift can't
    * drift the engines on negative hashes. */
  private[graft] def nearDupPairs(hashes: DataFrame): DataFrame = {
    val bands = hashes
      .select(col("img_id"), col("dhash"),
        explode(expr("array(0, 1, 2, 3)")).as("bk"))
      .withColumn("bv",
        expr("shiftright(dhash, bk * 16)").bitwiseAND(lit(65535L)))
    bands.as("x").join(bands.as("y"),
        col("x.bk") === col("y.bk") && col("x.bv") === col("y.bv") &&
          col("x.img_id") < col("y.img_id"))
      .select(col("x.img_id").as("a_id"), col("y.img_id").as("b_id"),
        col("x.dhash").as("ha"), col("y.dhash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= 3)
      .select("a_id", "b_id", "hamming")
  }

  // ------------------------------------------------ video (q149)

  /** q149 clip-corpus constants. */
  private val nClips = 24
  private val clipW = 32
  private val clipH = 24

  /** Grayscale frame pixel: the same middle-square mix, bounded to 225
    * so the near-dup +15 brightness shift can never clamp (dHash is
    * EXACTLY invariant to an unclamped uniform shift — pinned in
    * ImagePipelineSpec). Grayscale keeps the frame inside the GIF
    * writer's 256-color palette, so the encode->decode roundtrip is
    * lossless and a shifted copy's frames hash IDENTICALLY. */
  private def clipPixel(base: Long, f: Int, px: Int, shift: Int): Int = {
    val h = ((base * 131 + f) * 1000003L + px * 7919L + 12345L) % 1048576L
    (((h * h) >> 7) % 226L).toInt + shift
  }

  /** The video corpus: real animated GIFs (ImageIO-encoded, grayscale
    * frames from the formula). Every 4th clip (c % 4 == 1) is a
    * near-dup of its predecessor: +15 brightness on every frame AND
    * the last frame trimmed — the re-encoded/trimmed copy class a
    * crawl actually contains. */
  private[graft] def clipCorpus(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(0, nClips).as[Long].map { c =>
      val dup = c % 4 == 1
      val base = if (dup) c - 1 else c
      val nFrames = (4 + base % 3).toInt - (if (dup) 1 else 0)
      val frames = (0 until nFrames).map { f =>
        val img = new java.awt.image.BufferedImage(clipW, clipH,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var px = 0
        while (px < clipW * clipH) {
          val v = clipPixel(base, f, px, if (dup) 15 else 0)
          img.getRaster.setSample(px % clipW, px / clipW, 0, v)
          px += 1
        }
        img
      }
      (c, graft.pipeline.MediaFixtures.animatedGif(frames, delayCs = 10))
    }.toDF("clip_id", "bytes")
  }

  /** q149: video near-duplicates by frame-signature containment —
    * per-keyframe dHash (the q147 expression) over REAL decoded GIF
    * frames -> per-clip distinct signature set -> candidate pairs via
    * the shared-signature join (never all-pairs: the q35/q124 plan
    * class with dHashes as the token universe) -> exact integer
    * containment |A ∩ B| * 10000 / min(|A|, |B|) >= 8000. Trimmed,
    * re-encoded, and brightness-shifted copies share exact frame
    * hashes (losslessness + shift-invariance above); fuzzier frame
    * drift would band each frame hash first (q148's bands) — composed
    * deliberately from exact keys here so the containment arithmetic
    * stays integer-exact. Rows-only checked (DuckDB has no media
    * surface); pairs + containment pinned in ImagePipelineSpec. */
  private[graft] def videoNearDups(s: SparkSession): DataFrame = {
    import s.implicits._
    GraftFunctions.register(s)
    val media = graft.pipeline.Multimodal.asMediaFrame(
      clipCorpus(s), "clip_id", "video", "bytes")
    // every frame: delay 100 ms, sample every 100 ms -> all frames
    val frames = graft.pipeline.Multimodal.sampleVideoFrames(
      s, media, everyMs = 100, maxFrames = 8)
    val sigs = frames.as[(Long, Long, Array[Byte])]
      .flatMap { case (id, _, png) =>
        ImageOps.decodeEncoded(s"clip:$id", png)
          .map(d => (id, d.data, d.width, d.height, d.nChannels))
      }.toDF("clip_id", "data", "w", "h", "c")
      .select(col("clip_id"), expr("dhash64(data, w, h, c)").as("sig"))
      .filter(col("sig").isNotNull)
      .distinct()
    val sizes = sigs.groupBy("clip_id").agg(count(lit(1)).as("n"))
    val withN = sigs.join(sizes, "clip_id")
    withN.as("x").join(withN.as("y"),
        col("x.sig") === col("y.sig") &&
          col("x.clip_id") < col("y.clip_id"))
      .groupBy(col("x.clip_id").as("a_id"), col("y.clip_id").as("b_id"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("containment_bp",
        expr("shared * 10000 div least(na, nb)"))
      .filter(col("containment_bp") >= 8000)
      .select("a_id", "b_id", "shared", "containment_bp")
  }

  val queries: Map[String, Q] = Map(
    // q147: per-image 64-bit dHash — the multimodal content key
    "q147_image_dhash" -> ((s, _) => hashesOf(s).orderBy("img_id")),

    // q148: banded near-dup pairs, Hamming <= 3 exactly (recall-1
    // banding; the oracle is the exact all-pairs query)
    "q148_image_neardup" -> ((s, _) =>
      nearDupPairs(hashesOf(s)).orderBy("a_id", "b_id")),

    // q149: video near-dup by frame-signature containment (rows-only;
    // spec-pinned — no DuckDB media surface)
    "q149_video_neardup" -> ((s, _) =>
      videoNearDups(s).orderBy("a_id", "b_id")))

  /** The shared oracle prefix: replay pixels -> grayscale -> cells ->
    * bits -> packed hash in integer SQL. `hh` is the mixed value
    * (< 2^20, so hh*hh < 2^40 — BIGINT-safe; the JlProject bound
    * argument). Bit 63 cannot take `1 << 63` in DuckDB (overflow
    * error) — it adds two's-complement MIN directly. */
  private val hashCtes: String =
    s"""img AS (SELECT i FROM range(0, $nImages) t(i)),
        par AS (SELECT i, CASE WHEN i % 3 = 2 THEN i - 1 ELSE i END AS a,
                  (i % 3 = 2) AS isdup
                FROM img),
        pix AS (SELECT i, p,
                  ((hh * hh) >> 7) % 251
                    + CASE WHEN isdup AND p % 97 = 0 THEN 5 ELSE 0 END AS v
                FROM (SELECT i, isdup, p,
                        (a * 1000003 + p * 7919 + 12345) % 1048576 AS hh
                      FROM par, range(0, ${side * side * channels}) t2(p))),
        gray AS (SELECT i, p // 3 AS px, CAST(sum(v) // 3 AS BIGINT) AS g
                 FROM pix GROUP BY i, p // 3),
        cells AS (SELECT i, (px % $side) * 9 // $side AS tx,
                    (px // $side) * 8 // $side AS ty,
                    sum(g) // count(*) AS cell
                  FROM gray GROUP BY 1, 2, 3),
        bits AS (SELECT l.i, l.ty * 8 + l.tx AS b
                 FROM cells l JOIN cells r
                   ON r.i = l.i AND r.ty = l.ty AND r.tx = l.tx + 1
                 WHERE l.tx < 8 AND r.cell > l.cell),
        hashes AS (SELECT img.i AS img_id,
                     CAST(COALESCE(sum(CASE WHEN b = 63
                       THEN -9223372036854775807 - 1
                       ELSE (CAST(1 AS BIGINT) << b) END), 0) AS BIGINT)
                       AS dhash
                   FROM img LEFT JOIN bits ON bits.i = img.i
                   GROUP BY img.i)"""

  val oracle: Map[String, String] = Map(
    "q147_image_dhash" ->
      s"""WITH $hashCtes
          SELECT img_id, dhash FROM hashes ORDER BY img_id""",

    // exact all-pairs semantics — the banded Spark plan must reproduce
    // it (pigeonhole recall proof for Hamming <= 3 over 4x16 bands)
    "q148_image_neardup" ->
      s"""WITH $hashCtes
          SELECT x.img_id AS a_id, y.img_id AS b_id,
            CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT) AS hamming
          FROM hashes x JOIN hashes y ON x.img_id < y.img_id
          WHERE bit_count(xor(x.dhash, y.dhash)) <= 3
          ORDER BY a_id, b_id""")
}
