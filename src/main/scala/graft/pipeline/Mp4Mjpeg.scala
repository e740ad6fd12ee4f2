package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL pure-JVM video frame sampling for Motion-JPEG inside ISO-BMFF
  * (QuickTime .mov / .mp4 with a 'jpeg' video sample entry; the
  * 'png ' PNG-animation sibling entry rides the same tables and is
  * lossless end-to-end).
  *
  * The third genuinely decodable video path next to [[GifFrames]] and
  * [[AviMjpeg]]: MJPEG is intra-only and each sample is an ordinary
  * baseline JPEG the JDK's ImageIO reads natively, while the container
  * side is the same pure box-tree structure [[MediaProbe]] already
  * walks for metadata — here extended with the two tables the probe
  * deliberately skips because SAMPLING needs them and auditing does
  * not: stco/co64 (absolute chunk offsets into the file) and the full
  * stsc resolution that maps every sample index to its byte range.
  * QuickTime MJPEG is what scientific instruments, microscopes and
  * older cameras actually emit, so a 100 TB media crawl sees it;
  * inter-frame codecs (h264/vp9/av1) stay undecodable here and their
  * rows are dropped — [[MediaCodec]] documents why that seam is
  * honest for a zero-egress JVM.
  *
  * Timeline semantics mirror [[AviMjpeg]]: sampling instants are 0,
  * everyMs, 2·everyMs, … strictly inside the display span of the
  * RESOLVED sample prefix (= the full stts total on a coherent file;
  * on a lying/truncated table it ends with the last coherent sample,
  * so no instant is ever served a frame whose display interval does
  * not contain it), each instant
  * resolved to the sample whose display interval contains it — except
  * that stts makes PER-SAMPLE durations first-class, so a
  * variable-frame-rate table samples correctly where AVI's single
  * clock could not. Decoding is lazy + memoized (a coarse everyMs
  * never pays for the frames it skips); undecodable frames are
  * skipped, not substituted; every sampled frame re-encodes as PNG
  * (lossless — tests pin pixels of what was DECODED, independent of
  * JPEG's lossy encode). Total on any input: malformed bytes, lying
  * tables and truncations return None (MediaProbeSpec-style fuzz in
  * ImagePipelineSpec + the PropertySpec totality sweep), and declared
  * counts are bounded before any allocation trusts them.
  */
object Mp4Mjpeg {

  // in-memory streams only — never the per-image temp-file cache
  ImageIoTuning.ensure()

  // byte readers shared with MediaProbe (one definition per hardening
  // class — the RiffWav precedent); the box WALK itself is deliberately
  // separate: the probe accumulates metadata summaries and skips
  // stco/co64 entirely, this demuxer needs offsets and full stsc
  // resolution, and fusing the two walks would couple their bounding
  // rules to two different failure policies
  private def u8(b: Array[Byte], o: Int): Int = MediaProbe.u8(b, o)
  private def be32(b: Array[Byte], o: Int): Long = MediaProbe.be32(b, o)
  private def be64(b: Array[Byte], o: Int): Long = MediaProbe.be64(b, o)
  private def fourcc(b: Array[Byte], o: Int): String =
    if (o + 4 > b.length) "" else MediaProbe.fourcc(b, o)

  // a lying table may declare u32 entry counts; nothing here allocates
  // past this (2^20 frames ≈ 12 h of 24 fps — far past any real clip
  // this per-row path should decode)
  private val MaxSamples = 1 << 20

  /** Everything the sampler needs for ONE committed video trak. */
  private final class Tables {
    var timescale = 0L
    var sttsRuns: Vector[(Long, Long)] = Vector.empty // (count, delta)
    var sizes: Array[Long] = null // per-sample byte sizes (resolved)
    var stscRuns: Vector[(Long, Long)] = Vector.empty // (firstChunk, spc)
    var chunkOffs: Array[Long] = null // absolute file offsets
    def complete: Boolean =
      timescale > 0 && sttsRuns.nonEmpty && sizes != null &&
        sizes.length > 0 && stscRuns.nonEmpty && chunkOffs != null &&
        chunkOffs.length > 0
  }

  /** Walk the box tree; commit the FIRST trak that is (vide or
    * handlerless) with a 'jpeg' sample entry and complete tables. */
  private def demux(b: Array[Byte]): Option[Tables] = {
    var committed: Tables = null
    var cur: Tables = null
    var curHandler = ""
    var curIsJpeg = false
    var guard = 0
    def walk(from: Long, to: Long, depth: Int): Unit = {
      var o = from
      while (o + 8 <= to && guard < 4096 && committed == null) {
        guard += 1
        var size = be32(b, o.toInt)
        val typ = fourcc(b, o.toInt + 4)
        var hdr = 8L
        if (size == 1 && o + 16 <= to) { size = be64(b, o.toInt + 8); hdr = 16 }
        else if (size == 0) size = to - o
        if (size < hdr || o + size > to) return
        val body = o + hdr
        val bend = o + size
        typ match {
          case "moov" | "mdia" | "minf" | "stbl" =>
            if (depth < 8) walk(body, bend, depth + 1)
          case "trak" =>
            cur = new Tables; curHandler = ""; curIsJpeg = false
            if (depth < 8) walk(body, bend, depth + 1)
            // vide or handlerless only — a text/hint/meta trak with a
            // 'jpeg' entry must not masquerade as the video track
            // (the same whitelist MediaProbe's trak commit uses)
            if (committed == null && cur != null && curIsJpeg &&
                (curHandler == "vide" || curHandler.isEmpty) &&
                cur.complete) committed = cur
            cur = null
          case "hdlr" if cur != null && body + 12 <= bend =>
            curHandler = fourcc(b, body.toInt + 8)
          case "mdhd" if cur != null && body + 4 <= bend =>
            val ver = u8(b, body.toInt)
            if (ver == 1 && body + 24 <= bend)
              cur.timescale = be32(b, body.toInt + 20)
            else if (ver == 0 && body + 16 <= bend)
              cur.timescale = be32(b, body.toInt + 12)
          case "stsd" if cur != null && body + 16 <= bend =>
            // 'jpeg' is the QuickTime Motion-JPEG sample entry and
            // 'png ' its PNG-animation sibling — both are containers
            // of ordinary ImageIO-readable still images. 'mjpa'/'mjpb'
            // are FIELD-SPLIT MJPEG variants whose payloads are not
            // plain JFIF scans — ImageIO cannot read them, so they
            // stay at the seam rather than half-working here
            val entry = fourcc(b, body.toInt + 12)
            curIsJpeg = entry == "jpeg" || entry == "png "
          case "stts" if cur != null && body + 8 <= bend =>
            val n = be32(b, body.toInt + 4)
            var i = 0L; var off = body + 8
            val runs = Vector.newBuilder[(Long, Long)]
            while (i < n && off + 8 <= bend) {
              runs += ((be32(b, off.toInt), be32(b, off.toInt + 4)))
              i += 1; off += 8
            }
            cur.sttsRuns = runs.result()
          case "stsc" if cur != null && body + 8 <= bend =>
            val n = be32(b, body.toInt + 4)
            var i = 0L; var off = body + 8
            val runs = Vector.newBuilder[(Long, Long)]
            while (i < n && off + 12 <= bend) {
              runs += ((be32(b, off.toInt), be32(b, off.toInt + 4)))
              i += 1; off += 12
            }
            cur.stscRuns = runs.result()
          case "stsz" if cur != null && body + 12 <= bend =>
            val fixed = be32(b, body.toInt + 4)
            val n0 = be32(b, body.toInt + 8)
            val n = math.min(n0, MaxSamples.toLong).toInt
            if (n > 0) {
              if (fixed > 0) cur.sizes = Array.fill(n)(fixed)
              else {
                // only entries physically inside the box
                val have = math.min(n.toLong, (bend - body - 12) / 4).toInt
                cur.sizes = Array.tabulate(have)(i =>
                  be32(b, (body + 12 + 4L * i).toInt))
              }
            }
          case "stco" if cur != null && body + 8 <= bend =>
            val n0 = be32(b, body.toInt + 4)
            val have = math.min(math.min(n0, MaxSamples.toLong),
              (bend - body - 8) / 4).toInt
            cur.chunkOffs = Array.tabulate(have)(i =>
              be32(b, (body + 8 + 4L * i).toInt))
          case "co64" if cur != null && body + 8 <= bend =>
            val n0 = be32(b, body.toInt + 4)
            val have = math.min(math.min(n0, MaxSamples.toLong),
              (bend - body - 8) / 8).toInt
            cur.chunkOffs = Array.tabulate(have)(i =>
              be64(b, (body + 8 + 8L * i).toInt))
          case _ => ()
        }
        o = bend
      }
    }
    // accept only files that self-identify as ISO-BMFF/QuickTime
    if (b.length < 12 || (fourcc(b, 4) != "ftyp" && fourcc(b, 4) != "moov"
        && fourcc(b, 4) != "mdat" && fourcc(b, 4) != "wide"
        && fourcc(b, 4) != "skip")) return None
    walk(0, b.length.toLong, 0)
    Option(committed)
  }

  /** Resolve per-sample (startTimeMs, fileOffset, size) from the four
    * tables — the stsc run list maps chunk index → samples-per-chunk
    * (the LAST run extends to the remaining chunks, ISO 14496-12
    * §8.7.4), each chunk's samples lie consecutively from its stco
    * offset. Any inconsistency (offsets past EOF, sizes overrunning,
    * fewer chunks than the runs claim) stops resolution at the last
    * coherent sample — bounded output on lying input. */
  /** Resolution result: the coherent sample prefix plus the exact
    * tick where that prefix's display time ENDS — the sampling
    * horizon. On a fully coherent file coveredTicks equals the stts
    * total; on a lying/truncated table it stops with the last
    * resolved sample, so instants past the prefix are NOT clamped
    * onto the last frame (which would fabricate output at timestamps
    * the file never covered). */
  private final case class Resolved(
      frames: Array[(Long, Long, Int)], coveredTicks: Long)

  private def resolve(t: Tables, fileLen: Int): Resolved = {
    val n = t.sizes.length
    val out = Vector.newBuilder[(Long, Long, Int)]
    // per-sample start AND end times in media ticks (cumulative stts)
    val starts = new Array[Long](n)
    val ends = new Array[Long](n)
    var si = 0; var tick = 0L
    t.sttsRuns.foreach { case (cnt, delta) =>
      var c = 0L
      while (c < cnt && si < n) {
        starts(si) = tick; tick += delta; ends(si) = tick; si += 1; c += 1
      }
    }
    if (si < n) return Resolved(Array.empty, 0L) // stts short of stsz
    var sample = 0
    var chunk = 0
    var run = 0
    def done() = Resolved(out.result().toArray,
      if (sample > 0) ends(sample - 1) else 0L)
    while (sample < n && chunk < t.chunkOffs.length) {
      // samples-per-chunk for THIS chunk: advance the run pointer while
      // the next run's firstChunk (1-based) has begun
      while (run + 1 < t.stscRuns.length &&
        t.stscRuns(run + 1)._1 <= chunk + 1) run += 1
      val spc = t.stscRuns(run)._2
      if (spc <= 0) return done()
      var off = t.chunkOffs(chunk)
      var k = 0L
      while (k < spc && sample < n) {
        val sz = t.sizes(sample)
        // `off > fileLen - sz`, NOT `off + sz > fileLen`: a lying co64
        // offset just below 2^63 makes the sum wrap negative and PASS
        // the naive check, extending coveredTicks (the sampling
        // horizon) past the last coherent sample. The subtraction is
        // overflow-safe because sz ∈ (0, Int.MaxValue] is already
        // guaranteed by the two preceding tests.
        if (off < 0 || sz <= 0 || sz > Int.MaxValue ||
            off > fileLen.toLong - sz) return done()
        out += ((starts(sample) * 1000L / t.timescale, off, sz.toInt))
        off += sz; sample += 1; k += 1
      }
      chunk += 1
    }
    // fewer chunks than samples ⇒ the coherent prefix stands
    done()
  }

  /** Demux + JPEG-decode + sample the frame timeline at 0, everyMs,
    * 2·everyMs, … (up to `maxFrames` samples, strictly inside the
    * track's duration), returning (tsMs, pngBytes) per sample. None =
    * not ISO-BMFF, no 'jpeg' video trak, or no decodable frame. */
  def sample(bytes: Array[Byte], everyMs: Long,
      maxFrames: Int): Option[Seq[(Long, Array[Byte])]] = {
    try {
      val t = demux(bytes).getOrElse(return None)
      val r = resolve(t, bytes.length)
      val frames = r.frames
      if (frames.isEmpty) return None
      // sampling horizon = the RESOLVED prefix's end, not the declared
      // stts total: past-the-prefix instants are skipped, never served
      // the last frame's pixels at a timestamp the file never covered
      val totalMs = r.coveredTicks * 1000L / t.timescale
      if (totalMs <= 0) return None
      val decoded = new scala.collection.mutable.HashMap[Int, Option[
        java.awt.image.BufferedImage]]()
      def frameAt(i: Int) = decoded.getOrElseUpdate(i, {
        val (_, off, sz) = frames(i)
        Option(ImageIO.read(new ByteArrayInputStream(
          bytes.slice(off.toInt, off.toInt + sz))))
      })
      if (frames.indices.forall(frameAt(_).isEmpty)) return None
      val step = math.max(1L, everyMs)
      Some(Iterator.from(0).map(_ * step)
        .takeWhile(ts => ts == 0L || ts < totalMs)
        .take(math.max(0, maxFrames))
        .flatMap { ts =>
          // the sample whose display interval contains ts: the last
          // start <= ts (frames are start-time ascending by stts)
          var lo = 0; var hi = frames.length - 1
          while (lo < hi) {
            val mid = (lo + hi + 1) >>> 1
            if (frames(mid)._1 <= ts) lo = mid else hi = mid - 1
          }
          frameAt(lo).map { img =>
            val baos = new ByteArrayOutputStream()
            ImageIO.write(img, "png", baos)
            (ts, baos.toByteArray)
          }
        }
        .toVector)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }
}
