package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.{ImageOps, ImagePipeline, ImageRecord, MediaFixtures,
  Multimodal}

/** The reference's core workload as a benchmarked query: a synthetic
  * image corpus pushed through the full augment chain (decode -> area
  * resize 224x224 -> seeded flip -> rotate 15 deg -> color jitter ->
  * JPEG q95 encode), i.e. SURVEY.md §2-A A8-A13 end to end. Rows-only
  * checked (binary outputs are not SQL-expressible); per-op semantics
  * are pinned by ImagePipelineSpec.
  *
  * The corpus is generated distributed (spark.range -> map), so the
  * benchmark measures per-core augment throughput exactly like the
  * reference's foreachPartition loop — but as a committed, restartable
  * Dataset transform.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  private val imgSide = 96
  private val nImages = 256

  private def syntheticImage(i: Long): ImageRecord = {
    val data = new Array[Byte](imgSide * imgSide * 3)
    var p = 0
    while (p < data.length) {
      // deterministic per-image gradient/pattern
      data(p) = (((p + i * 31) % 251) & 0xff).toByte
      p += 1
    }
    ImageRecord(s"mem://synthetic/$i", imgSide, imgSide, 3, 16, data)
  }

  val queries: Map[String, Q] = Map(
    "q44_image_augment" -> ((s, _) => {
      import s.implicits._
      val imgs = s.range(0, nImages).as[Long].map(syntheticImage _)
      ImagePipeline.augmentChain(imgs, 224, 224, seed = 42)
        .map { case (path, bytes) => (path, bytes.length) }
        .toDF("path", "jpeg_bytes")
        .orderBy("path")
    }),

    // q138: structural media metadata probe — a synthetic mixed-format
    // corpus (real MPEG-audio/WAV/GIF/MP4/Ogg/WebM/ADTS-AAC container
    // bytes, generated distributed from the row id) probed WITHOUT decode:
    // container, codec, rates, duration, dimensions, frame counts.
    // The 100 TB read-path shape for media columns: a pure per-row map
    // (no shuffle until the final presentation sort) that decides
    // which rows justify a codec-equipped decode stage. Rows-only
    // checked (DuckDB has no media surface); every field value is
    // pinned by MediaProbeSpec, the parsers fuzzed for totality.
    "q138_media_probe" -> ((s, _) => {
      import s.implicits._
      val media = Multimodal.asMediaFrame(
        s.range(0, 100).as[Long].map(MediaFixtures.synth _)
          .toDF("id", "bytes"),
        "id", "mixed", "bytes")
      Multimodal.probeMetadata(s, media).orderBy("media_id")
    })
  )

  /** No DuckDB oracle (binary pipeline); rows-only + ScalaTest. */
  val oracle: Map[String, String] = Map.empty
}
