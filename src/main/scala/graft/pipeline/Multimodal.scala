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
  * codecs and video frame extraction go through the injectable
  * [[MediaCodec]] seam, whose default is a documented deterministic
  * stub (this container ships no mp3/ogg/aac/video codecs); the
  * Spark-side plumbing — schema, batch shape, partitioning — is real
  * and tested, and a production deploy swaps only the codec value.
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
    * [[compressedAudioFeatures]] with a real [[MediaCodec]]. */
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

  /** Compressed-audio feature extraction through the [[MediaCodec]]
    * seam. The default is now the REAL pure-JVM codec
    * ([[MediaCodec.Jvm]]): IMA/DVI ADPCM WAV decodes for real
    * (ImaAdpcm), PCM/u-law/a-law fall back to javax.sound; mp3/ogg/aac
    * rows are dropped (None) until a codec-equipped deploy plugs in its
    * own [[MediaCodec]]. WAV/PCM content can also use the direct
    * [[audioFeatures]]. */
  def compressedAudioFeatures(spark: SparkSession, media: DataFrame,
      nMel: Int = 16, codec: MediaCodec = MediaCodec.Jvm): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        codec.audioFeatures(bytes, nMel).map(f => (id, f))
      }.toDF("media_id", "features")
  }

  /** Structural metadata probe over a media frame: one typed row per
    * clip whose container [[MediaProbe]] recognizes (mp3/mp2 and ADTS
    * aac frame walks, mp4 box tree, ogg pages, wav/avi RIFF, flac
    * STREAMINFO, gif blocks, webm/mkv EBML) — codec identity,
    * duration, resolution, rates — WITHOUT
    * decoding. This is how a 100 TB corpus filters/buckets/cost-models
    * media columns before routing the keeper rows through a
    * codec-equipped decode stage: the probe is a pure per-row map
    * (no shuffle, stream-safe), and formats this container cannot
    * decode (mp3, mp4 video) still yield full audit metadata here
    * instead of dropping. Unrecognized bytes drop, the pipeline-wide
    * policy. */
  def probeMetadata(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        MediaProbe.probe(bytes).map(m => (id, m.container, m.codec,
          m.sampleRate, m.channels, m.bitrateKbps, m.durationMs,
          m.width, m.height, m.frames,
          m.trackDurMs, m.fpsMilli, m.sampleBytes, m.maxSampleBytes,
          m.chunks, m.syncSamples))
      }.toDF("media_id", "container", "codec", "sample_rate", "channels",
        "bitrate_kbps", "duration_ms", "width", "height", "frames",
        "track_dur_ms", "fps_milli", "sample_bytes", "max_sample_bytes",
        "chunks", "sync_samples")
  }

  /** Video frame sampling through the [[MediaCodec]] seam. The default
    * [[MediaCodec.Jvm]] demuxes + decodes for real from animated GIF
    * ([[GifFrames]]), AVI/MJPEG ([[AviMjpeg]]) and QuickTime/mp4 MJPEG
    * ([[Mp4Mjpeg]]), and DROPS clips whose codec this offline JVM
    * cannot decode (h264/vp9/av1 in mp4/webm/mkv) — the
    * drop-undecodable policy the rest of the media pipeline uses. One
    * output row per sampled frame, one frame every `everyMs` along the
    * clip's timeline. */
  def sampleVideoFrames(spark: SparkSession, media: DataFrame,
      everyMs: Long = 1000, maxFrames: Int = 4,
      codec: MediaCodec = MediaCodec.Jvm): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        codec.sampleFrames(bytes, everyMs, maxFrames)
          .map { case (ts, fb) => (id, ts, fb) }
      }.toDF("media_id", "frame_ts_ms", "frame_bytes")
  }
}
