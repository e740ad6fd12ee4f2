package graft.pipeline

import javax.imageio.ImageIO

/** One-time JVM-wide ImageIO tuning, referenced from every object that
  * touches ImageIO (first access runs the initializer; later calls are
  * free static no-ops).
  *
  * `ImageIO.getUseCache` defaults to TRUE, which makes every
  * `ImageIO.read(InputStream)` / `ImageIO.write(..., OutputStream)` /
  * `createImageInput(Output)Stream` route through a
  * FileCache(Image)Stream — a TEMP FILE created, written, re-read and
  * deleted PER IMAGE, even when the source/sink is a pure in-memory
  * byte array (every graft call site: images live in binary columns,
  * never on local disk). That is per-row executor disk I/O this engine
  * has no reason to do:
  *
  *  - at 100 TB it turns a CPU-bound decode stage into a local-disk
  *    workload — 32 concurrent tasks hammering java.io.tmpdir with
  *    KB-sized create/delete churn, contending with shuffle spill and
  *    subject to whatever the cluster mounts /tmp on;
  *  - it couples decode THROUGHPUT to background I/O load: measured
  *    on the r15 builder host, the PNG-roundtrip bench keys (q147/
  *    q148) ran ~2x slower under ambient disk load with the file
  *    cache on, and recovered with it off, while the audio keys
  *    (javax.sound, which streams ByteArrayInputStream directly) sat
  *    unmoved in their bands — the differential that exposed this;
  *  - the memory-cache alternative buffers at most one image, and
  *    every image this library decodes is already bounded in memory
  *    as a byte-array column value, so the disk cache buys nothing.
  */
private[graft] object ImageIoTuning {
  ImageIO.setUseCache(false)

  /** Referencing this forces the object initializer exactly once. */
  def ensure(): Unit = ()
}
