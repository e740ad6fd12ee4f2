package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media travels
  * as an opaque BINARY column plus a typed metadata struct; decode /
  * feature-extract / frame-sample are partition-parallel transforms.
  *
  * Image decode is REAL (JDK ImageIO via graft.pipeline.ImageOps —
  * jpeg/png/bmp/gif). Audio decode is REAL for WAV/PCM (JDK
  * javax.sound.sampled via graft.pipeline.AudioOps). Compressed audio
  * codecs and video frame extraction are STUBBED with deterministic
  * fakes (this container ships no mp3/ogg/aac/video codecs); the
  * Spark-side plumbing — schema, batch shape, partitioning — is real and
  * tested, and a production deploy swaps only the marked functions.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Wrap raw binary rows into the canonical media frame. */
  def asMediaFrame(df: DataFrame, idCol: String, kind: String,
      bytesCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(bytesCol).as("content"),
      struct(lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Image feature extraction: decode (REAL, ImageIO) -> resize ->
    * CHW float tensor. Returns (media_id, features ARRAY<FLOAT>). */
  def imageFeatures(spark: SparkSession, media: DataFrame,
      tw: Int = 8, th: Int = 8): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        ImageOps.decodeEncoded(s"media:$id", bytes).map { img =>
          val t = ImageOps.toTensorCHW(ImageOps.resizeArea(img, tw, th))
          (id, ImageOps.normalizeCHW(t, img.nChannels))
        }
      }.toDF("media_id", "features")
  }

  /** REAL audio feature extraction for WAV/PCM content: decode to mono
    * samples (AudioOps, pure JDK) and emit `nSeg` per-segment RMS
    * energies. Rows whose bytes javax.sound cannot parse (compressed
    * codecs) are dropped, mirroring the image pipeline's
    * drop-undecodable policy — route those through
    * [[audioFeaturesStub]] until a codec-equipped deploy swaps it out. */
  def audioFeatures(spark: SparkSession, media: DataFrame,
      nSeg: Int = 16): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        AudioOps.decodeWav(bytes).map { case (_, samples) =>
          (id, AudioOps.segmentEnergies(samples, nSeg))
        }
      }.toDF("media_id", "features")
  }

  /** STUB — compressed-codec audio fallback. A real deploy decodes
    * mp3/ogg/aac and computes e.g. mel filterbanks; here a deterministic
    * fake derives `nMel` pseudo-energies from content bytes so schema,
    * determinism and partitioning are exercised end-to-end. WAV/PCM
    * content should use the real [[audioFeatures]] instead. */
  def audioFeaturesStub(spark: SparkSession, media: DataFrame,
      nMel: Int = 16): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val feats = Array.tabulate(nMel) { m =>
          var acc = 0L
          var i = m
          while (i < bytes.length) { acc = acc * 31 + (bytes(i) & 0xff); i += nMel }
          (acc & 0xffff).toFloat / 0xffff
        }
        (id, feats)
      }.toDF("media_id", "features")
  }

  /** STUB — video frame sampling. A real deploy demuxes and decodes every
    * `everyMs` frame; the fake emits one pseudo-frame record per sampled
    * timestamp with bytes sliced from content, preserving the
    * one-row-per-frame output shape of a real sampler. */
  def sampleFramesStub(spark: SparkSession, media: DataFrame,
      everyMs: Long = 1000, maxFrames: Int = 4): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = math.min(maxFrames, math.max(1, bytes.length / 16))
        (0 until n).map { f =>
          val start = f * (bytes.length / n)
          (id, f.toLong * everyMs, bytes.slice(start, start + 16))
        }
      }.toDF("media_id", "frame_ts_ms", "frame_bytes")
  }
}
