package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.{ImageOps, ImagePipeline, ImageRecord}

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
    })
  )

  /** No DuckDB oracle (binary pipeline); rows-only + ScalaTest. */
  val oracle: Map[String, String] = Map.empty
}
