package graft.pipeline

/** Structural media metadata probing — the honest middle ground between
  * "decode for real" and "drop the row".
  *
  * The compressed formats this offline JVM cannot *decode* (mp3/aac
  * audio frames, inter-frame video — see [[MediaCodec]] for why) still
  * carry fully ALGORITHMIC container/framing layers: an MPEG audio
  * stream is a self-describing sequence of fixed-layout frame headers;
  * an mp4 is a tree of length-prefixed boxes; an ogg is a sequence of
  * CRC-framed pages. Parsing those layers needs no codec data tables —
  * every offset and field width below is pure container structure (ISO
  * 11172-3 §2.4.1 frame header, ISO 14496-12 box layout, RFC 3533 page
  * layout) — so a 100 TB pipeline can filter, audit, bucket and
  * cost-model media columns (codec, duration, resolution, bitrate)
  * without shipping a single codec, and route only the rows it actually
  * wants through a codec-equipped [[MediaCodec]] deploy.
  *
  * Reference parity note: the reference pipeline's media handling is
  * images only (reference: src/piper/utils/constants.py:2) — this probe
  * is extension-brief surface (VERDICT r8 "What's missing" §3), not a
  * reference port.
  *
  * Every probe is total: any byte input returns None or a valid info
  * record, never throws (MediaProbeSpec fuzzes this). Probes are pure
  * per-row functions — map-side only, no shuffle, stream-safe.
  */
object MediaProbe {

  /** One typed metadata record per recognized clip. Unknown numeric
    * fields are 0 (ints) / 0L (longs); `codec` is the innermost coded
    * stream this probe could identify, `container` the outer framing.
    *
    * The four trailing fields are the ISO-BMFF SAMPLE-TABLE summary
    * (r10) — pure structure from the primary trak's stts/stsc/stsz
    * boxes, 0 for every other container: `trackDurMs` is the EXACT
    * track duration (Σ stts sample_count·sample_delta, rescaled by the
    * mdhd media timescale — the movie-level mvhd duration in
    * `durationMs` legally disagrees when traks differ), `fpsMilli` the
    * exact frame rate in millihertz derived from it, `sampleBytes` /
    * `maxSampleBytes` the total and largest coded sample from stsz,
    * and `chunks` the chunk count reconstructed from the stsc run
    * table + the stsz sample count. These are what let a 100 TB media
    * scan cost-model decode work (bytes, frame counts, rates) and spot
    * corrupt tables WITHOUT touching codec data.
    *
    * `syncSamples` (r12) is the trak's random-access point count: the
    * stss sync-sample table's entry count when the box is present,
    * else the full sample count (a MISSING stss means every sample is
    * sync, ISO 14496-12 §8.6.2 — the all-intra / audio case). This is
    * the field a keyframe-sampling video stage plans against: work ∝
    * sync points, not frames, and sparse-keyframe clips (GOP length =
    * frames/syncSamples) cost a full inter-frame decode per sample. */
  final case class MediaInfo(
      container: String, codec: String,
      sampleRate: Int, channels: Int, bitrateKbps: Int,
      durationMs: Long, width: Int, height: Int, frames: Long,
      trackDurMs: Long = 0, fpsMilli: Long = 0,
      sampleBytes: Long = 0, maxSampleBytes: Long = 0, chunks: Long = 0,
      syncSamples: Long = 0)

  /** Probe any supported container; None when nothing matches. The
    * magic checks are disjoint AT OFFSET 0, so order is mostly a
    * speed choice; the one exception is the two raw-sync WINDOW
    * scanners (ADTS vs MPEG audio), where probeAdts explicitly defers
    * to a verified mp3 stream at the start offset — see its header
    * comment. */
  def probe(bytes: Array[Byte]): Option[MediaInfo] =
    if (bytes == null || bytes.length < 8) None
    else probeMp4(bytes).orElse(probeEbml(bytes)).orElse(probeOgg(bytes))
      .orElse(probeRiff(bytes)).orElse(probeAiff(bytes))
      .orElse(probeAu(bytes)).orElse(probeFlacHeader(bytes))
      .orElse(probeGifHeader(bytes)).orElse(probeAdts(bytes))
      .orElse(probeMp3(bytes))

  // ---------------------------------------------------------------- utils

  // u8/be32/be64/fourcc are private[pipeline]: Mp4Mjpeg reads the
  // same big-endian box layout (one definition per hardening class,
  // the RiffWav precedent for the little-endian side)
  private[pipeline] def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def be16(b: Array[Byte], o: Int): Int = (u8(b, o) << 8) | u8(b, o + 1)
  // little-endian readers live in RiffWav (one definition per hardening
  // class — see its scaladoc); the big-endian ones have no other user
  private def le16(b: Array[Byte], o: Int): Int = RiffWav.le16(b, o)
  private def le32(b: Array[Byte], o: Int): Long = RiffWav.le32(b, o)
  private[pipeline] def be32(b: Array[Byte], o: Int): Long =
    ((u8(b, o).toLong << 24) | (u8(b, o + 1) << 16) |
      (u8(b, o + 2) << 8) | u8(b, o + 3)) & 0xffffffffL
  private[pipeline] def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def le64(b: Array[Byte], o: Int): Long =
    le32(b, o) | (le32(b, o + 4) << 32)
  /** Saturating arithmetic for the sample-table sums: a lying table
    * can declare u32 counts/sizes whose products exceed Long, and a
    * wrapped negative would masquerade as data. Overflow maps to -1,
    * which the trak commit turns into 0 ("unknown") — bounded output
    * on any input, like every other probe field. */
  private def mulCap(a: Long, b: Long): Long =
    if (a < 0 || b < 0) -1L
    else try Math.multiplyExact(a, b)
    catch { case _: ArithmeticException => -1L }
  private def addCap(a: Long, b: Long): Long =
    if (a < 0 || b < 0) -1L
    else try Math.addExact(a, b)
    catch { case _: ArithmeticException => -1L }

  private[pipeline] def fourcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)),
      java.nio.charset.StandardCharsets.ISO_8859_1)
  private def matches(b: Array[Byte], o: Int, s: String): Boolean =
    o + s.length <= b.length && s.indices.forall(i => b(o + i) == s(i).toByte)

  // ------------------------------------------------------- MPEG audio (mp3)

  // ISO 11172-3 / 13818-3 frame header tables. These are the small,
  // universally published HEADER lookup tables (bitrate/samplerate
  // indices) — container structure, not the Layer III Huffman DATA
  // tables MediaCodec documents as non-derivable.
  private val V1 = 3; private val V2 = 2; private val V25 = 0 // version field
  private val brV1 = Array( // kbps by [layer 1..3][index 1..14]
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
  private val brV2 = Array(
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
  private val srV1 = Array(44100, 48000, 32000)

  /** (frameBytes, samplesPerFrame, sampleRate, bitrateKbps, channels,
    * layer) for a syncword at `o`, or null when the 4 header bytes are
    * not a valid MPEG audio frame header. */
  private def mp3Header(b: Array[Byte], o: Int): Array[Int] = {
    if (o + 4 > b.length) return null
    if (u8(b, o) != 0xff || (u8(b, o + 1) & 0xe0) != 0xe0) return null
    val version = (u8(b, o + 1) >> 3) & 3      // 0=2.5 1=res 2=V2 3=V1
    val layerF = (u8(b, o + 1) >> 1) & 3        // 1=III 2=II 3=I
    if (version == 1 || layerF == 0) return null
    val layer = 4 - layerF                      // 1..3
    val brIdx = (u8(b, o + 2) >> 4) & 0xf
    val srIdx = (u8(b, o + 2) >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null
    if ((u8(b, o + 3) & 3) == 2) return null    // reserved emphasis
    val bitrate =
      (if (version == V1) brV1 else brV2)(layer - 1)(brIdx - 1)
    val sr = version match {
      case V1 => srV1(srIdx)
      case V2 => srV1(srIdx) / 2
      case _ => srV1(srIdx) / 4
    }
    val pad = (u8(b, o + 2) >> 1) & 1
    val chan = if (((u8(b, o + 3) >> 6) & 3) == 3) 1 else 2
    val (len, spf) = layer match {
      case 1 => ((12 * bitrate * 1000 / sr + pad) * 4, 384)
      case 2 => (144 * bitrate * 1000 / sr + pad, 1152)
      case _ =>
        if (version == V1) (144 * bitrate * 1000 / sr + pad, 1152)
        else (72 * bitrate * 1000 / sr + pad, 576)
    }
    Array(len, spf, sr, bitrate, chan, layer, version)
  }

  /** Walk every frame of an MPEG audio stream (mp3 being layer III).
    * Sync acceptance needs TWO consecutive headers agreeing on
    * version/layer/samplerate — a single 0xFFEx match in arbitrary
    * binary is far too common to declare "this is an mp3". An ID3v2
    * prefix is skipped by its synchsafe length. Duration (r11): a
    * Xing/Info/VBRI header frame's declared frame/byte totals win —
    * exact for VBR and for prefix-window probes; otherwise exact from
    * the walked frame count (each frame = spf/sr seconds). The average
    * bitrate comes from declared bytes when present, else from walked
    * bytes, so VBR streams report their true mean, not the first
    * frame's nominal rate. */
  /** Offset of the first post-ID3v2 byte (0 when no tag). Shared by
    * the two raw-frame-stream formats an ID3 tag legally prefixes
    * (MPEG audio and ADTS AAC); the synchsafe size excludes the
    * 10-byte header and, per flags bit 4, a 10-byte footer. */
  private def skipId3(b: Array[Byte]): Int =
    if (matches(b, 0, "ID3") && b.length >= 10) {
      val sz = ((u8(b, 6) & 0x7f) << 21) | ((u8(b, 7) & 0x7f) << 14) |
        ((u8(b, 8) & 0x7f) << 7) | (u8(b, 9) & 0x7f)
      // flags bit 4: a 10-byte footer follows the tag body (its length
      // is NOT included in the synchsafe size)
      val footer = if ((u8(b, 5) & 0x10) != 0) 10 else 0
      math.min(b.length, 10 + sz + footer)
    } else 0

  private def probeMp3(b: Array[Byte]): Option[MediaInfo] = {
    val start = skipId3(b)
    // find the first verified sync within a bounded probe window
    var o = start
    var h: Array[Int] = null
    val limit = math.min(b.length - 4, start + 64 * 1024)
    while (h == null && o < limit) {
      val c = mp3Header(b, o)
      if (c != null) {
        val n = mp3Header(b, o + c(0))
        val consistent = n != null && n(2) == c(2) && n(5) == c(5) &&
          n(6) == c(6)
        // a stream whose ONLY frame fills the rest of the input is
        // also acceptable (single-frame clip)
        if (consistent || o + c(0) == b.length) h = c else o += 1
      } else o += 1
    }
    if (h == null) return None
    // VBR header frame (Xing/Info after the Layer-III side info, or
    // Fraunhofer VBRI at its fixed +32 offset): the encoder-declared
    // frame/byte TOTALS give the exact duration of the WHOLE stream
    // even when this probe sees only a prefix window of the clip (the
    // crawl case — mdat-style tails never fetched), and they are the
    // only correct duration for VBR, where no single frame's nominal
    // bitrate describes the file. The frame-walk below stays as the
    // un-tagged (plain CBR) path and as the byte counter. The header
    // frame is metadata, not audio: it is excluded from the walked
    // count, matching the declared-total convention.
    var xFrames = -1L; var xBytes = -1L; var headerFrame = false
    if (h(5) == 3) { // Xing/VBRI are Layer III structures
      val sideInfo =
        if (h(6) == V1) { if (h(4) == 1) 17 else 32 }
        else { if (h(4) == 1) 9 else 17 }
      val xo = o + 4 + sideInfo
      if (matches(b, xo, "Xing") || matches(b, xo, "Info")) {
        headerFrame = true
        if (xo + 8 <= b.length) {
          val flags = be32(b, xo + 4)
          var p = xo + 8
          if ((flags & 1) != 0 && p + 4 <= b.length) {
            xFrames = be32(b, p); p += 4
          }
          if ((flags & 2) != 0 && p + 4 <= b.length) xBytes = be32(b, p)
        }
      } else if (matches(b, o + 36, "VBRI")) {
        // "VBRI" sits 32 bytes after the 4-byte header regardless of
        // channel mode; bytes at +10, frames at +14 (both be32)
        headerFrame = true
        if (o + 36 + 18 <= b.length) {
          xBytes = be32(b, o + 36 + 10)
          xFrames = be32(b, o + 36 + 14)
        }
      }
    }
    var frames = 0L; var bytes = 0L; var pos = o
    var cur = h
    while (cur != null && pos + cur(0) <= b.length) {
      frames += 1; bytes += cur(0); pos += cur(0)
      cur = mp3Header(b, pos)
      if (cur != null && (cur(2) != h(2) || cur(5) != h(5))) cur = null
    }
    if (headerFrame && frames > 0) { frames -= 1; bytes -= h(0) }
    // declared totals win over the walked prefix; a tag missing its
    // frames field (flags bit unset / truncated) falls back to the walk.
    // Sanity bounds (ADVICE r11 — a tag is untrusted input): declared
    // frames are used only when physically consistent with the declared
    // byte total (every MPEG frame occupies >= 24 bytes, the format's
    // smallest padded frame), and the duration is clamped to the
    // longest stream the tag's own 32-bit byte counter could describe
    // (4 GiB at the 8 kbps floor — numerically 0xFFFFFFFF ms, ~50
    // days). A hostile frames=0xFFFFFFFF now yields a bounded field or
    // falls back to the walk, never a 3.5-year durationMs.
    if (xFrames >= 0 && !(xBytes >= 0 && xFrames > xBytes / 24 + 1))
      frames = xFrames
    val durMs =
      math.min(frames * h(1).toLong * 1000L / h(2), 0xFFFFFFFFL)
    // clamp: a lying tag (huge declared bytes over one frame's worth of
    // declared duration) must yield a bounded field, not an Int wrap
    val avgKbps =
      if (durMs > 0) math.min(
        (if (xBytes >= 0) xBytes else bytes) * 8 / durMs,
        Int.MaxValue.toLong).toInt
      else h(3)
    val name = h(5) match {
      case 3 => "mp3"
      case 2 => "mp2"
      case _ => "mp1"
    }
    Some(MediaInfo("mpeg-audio", name, h(2), h(4), avgKbps, durMs,
      0, 0, frames))
  }

  // -------------------------------------------------------- ADTS (aac)

  // ADTS sampling_frequency_index table (ISO 14496-3 §1.6.3.4) —
  // indices 13/14 are reserved, 15 is the escape ADTS forbids.
  private val adtsSr = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** (frameBytes, samplesInFrame, sampleRate, channels, profile) for
    * an ADTS header at `o`, or null. The fixed header is pure bit
    * layout (ISO 14496-3 §1.A.2.2): 12-bit sync 0xFFF with the 2 layer
    * bits 00 (which is exactly what keeps ADTS and MPEG-audio syncs
    * disjoint — mp3Header REJECTS layer 00), a 13-bit frame length
    * that INCLUDES the 7-byte header (9 with the optional CRC), and a
    * raw-data-block count so one frame can carry up to 4×1024-sample
    * AAC blocks. */
  private def adtsHeader(b: Array[Byte], o: Int): Array[Int] = {
    if (o + 7 > b.length) return null
    if (u8(b, o) != 0xff || (u8(b, o + 1) & 0xf6) != 0xf0) return null
    val protAbsent = u8(b, o + 1) & 1
    val profile = (u8(b, o + 2) >> 6) & 3
    val srIdx = (u8(b, o + 2) >> 2) & 0xf
    if (srIdx >= 13) return null // 13/14 reserved, 15 escape-forbidden
    val chanCfg = ((u8(b, o + 2) & 1) << 2) | ((u8(b, o + 3) >> 6) & 3)
    val frameLen = ((u8(b, o + 3) & 3) << 11) | (u8(b, o + 4) << 3) |
      ((u8(b, o + 5) >> 5) & 7)
    val hdrLen = if (protAbsent == 1) 7 else 9
    if (frameLen < hdrLen) return null // a lying length cannot stall the walk
    val blocks = (u8(b, o + 6) & 3) + 1
    // chanCfg 7 means 7.1 (8 channels); 0 means "in a PCE" — report 0
    val chans = if (chanCfg == 7) 8 else chanCfg
    Array(frameLen, blocks * 1024, adtsSr(srIdx), chans, profile)
  }

  /** Walk an ADTS AAC stream — the raw framing aac crawls actually
    * ship in (.aac side files, HLS segments). Same acceptance rule as
    * MPEG audio: TWO consecutive headers agreeing on samplerate and
    * profile (a 0xFFFx sync in arbitrary binary is too common), or a
    * single frame that exactly fills the input. Duration is exact
    * container structure: Σ raw_data_blocks·1024 samples over the
    * walked frames. The AAC payload itself needs codec data tables
    * ([[MediaCodec]]) — everything read here is framing. */
  private def probeAdts(b: Array[Byte]): Option[MediaInfo] = {
    val start = skipId3(b)
    var o = start
    var h: Array[Int] = null
    val limit = math.min(b.length - 7, start + 64 * 1024)
    while (h == null && o < limit) {
      val c = adtsHeader(b, o)
      if (c != null) {
        val n = adtsHeader(b, o + c(0))
        val consistent = n != null && n(2) == c(2) && n(4) == c(4)
        if (consistent || o + c(0) == b.length) h = c else o += 1
      } else o += 1
    }
    if (h == null) return None
    // AT the stream start the two raw-sync formats are bit-disjoint
    // (ADTS is layer 00, exactly what mp3Header rejects) — but window
    // scans are not: a genuine mp3's compressed payload can contain
    // two consecutive ADTS-shaped false syncs, and this probe runs
    // first. probeMp3 tolerates junk BEFORE its first sync via its own
    // 64 KB window scan, so the defer check must mirror that window,
    // not just the post-ID3 offset: if a VERIFIED MPEG-audio sync
    // (two consecutive agreeing headers, or a single frame exactly
    // filling the input — probeMp3's acceptance rule) exists at or
    // before the accepted ADTS sync, the stream is probeMp3's.
    var mo = start
    while (mo <= o) {
      val m = mp3Header(b, mo)
      if (m != null) {
        val n2 = mp3Header(b, mo + m(0))
        if ((n2 != null && n2(2) == m(2) && n2(5) == m(5) &&
            n2(6) == m(6)) || mo + m(0) == b.length) return None
        mo += 1
      } else mo += 1
    }
    var frames = 0L; var samples = 0L; var bytes = 0L; var pos = o
    var cur = h
    while (cur != null && pos + cur(0) <= b.length) {
      frames += 1; samples += cur(1); bytes += cur(0); pos += cur(0)
      cur = adtsHeader(b, pos)
      if (cur != null && (cur(2) != h(2) || cur(4) != h(4))) cur = null
    }
    val durMs = samples * 1000L / h(2)
    val avgKbps =
      if (durMs > 0) math.min(bytes * 8 / durMs, Int.MaxValue.toLong).toInt
      else 0
    // the 2-bit profile is the audio object type - 1 (Main/LC/SSR/LTP)
    val prof = h(4) match {
      case 0 => "aac-main"; case 1 => "aac-lc"
      case 2 => "aac-ssr"; case _ => "aac-ltp"
    }
    Some(MediaInfo("adts", prof, h(2), h(3), avgKbps, durMs,
      0, 0, frames))
  }

  // ------------------------------------------------------ ISO-BMFF (mp4)

  /** mp4 / mov / m4a probe: walks the length-prefixed box tree to mvhd
    * (movie timescale + duration), each trak's tkhd (16.16 fixed
    * width/height), hdlr (vide/soun) and stsd (first sample-entry
    * fourcc = the coded stream's identity; mp4a entries additionally
    * carry channel count and a 16.16 sample rate). The moov may follow
    * gigabytes of mdat: top-level walking skips boxes by declared size,
    * so probing cost is O(#boxes), not O(bytes). */
  private def probeMp4(b: Array[Byte]): Option[MediaInfo] = {
    if (b.length < 12 || !matches(b, 4, "ftyp")) return None
    var container = "mp4"
    var vCodec = ""; var aCodec = ""
    var durMs = 0L; var w = 0; var h = 0
    var sr = 0; var ch = 0
    // per-handler sample counts: `frames` must report the VIDEO frame
    // count when a video trak exists regardless of trak order (muxers
    // commonly list audio first), falling back to the audio sample
    // count for audio-only files
    var vSamples = 0L; var aSamples = 0L; var anySamples = 0L
    // handler type ('vide'/'soun') of the trak being walked: the
    // AUTHORITATIVE audio-vs-video routing for its stsd entry (ISO
    // 14496-12 §8.4.3). The fourcc whitelist below stays only as the
    // fallback for streams whose hdlr precedes no stsd (or is absent).
    var curHandler = ""
    // tkhd precedes mdia/hdlr inside its trak, so dims are STASHED per
    // trak and committed only after the trak's subtree reveals the
    // handler — width/height must come from the video trak (first-wins,
    // like every other field), not from whichever trak was listed last:
    // subtitle/chapter traks (tx3g) legally carry nonzero tkhd dims
    var pendW = 0; var pendH = 0   // dims seen in the current trak
    var fbW = 0; var fbH = 0       // first handlerless trak's dims
    // sample-table stash for the trak being walked (r10): mdhd media
    // timescale, stts duration/count sums, stsz totals, stsc runs —
    // committed as a GROUP per trak so trackDurMs/fpsMilli/sampleBytes/
    // chunks always describe the SAME trak (first video trak wins,
    // audio fallback, handlerless last — the `frames` routing)
    var pendTs = 0L
    var pendSttsDur = 0L; var pendSttsN = 0L
    var pendSzN = 0L; var pendSzTotal = 0L; var pendSzMax = 0L
    var pendStsc: Vector[(Long, Long)] = Vector.empty // (first_chunk, spc)
    var pendStss = -1L // -1 = no stss box (≠ 0 = an empty/truncated one)
    // committed groups: (trackDurMs, fpsMilli, bytes, maxBytes, chunks,
    // syncSamples)
    type SampleGroup = (Long, Long, Long, Long, Long, Long)
    var vGrp: SampleGroup = null; var aGrp: SampleGroup = null
    var anyGrp: SampleGroup = null

    def walk(from: Long, to: Long, depth: Int, inTrak: Boolean): Unit = {
      var o = from
      var guard = 0
      while (o + 8 <= to && guard < 4096) {
        guard += 1
        var size = be32(b, o.toInt)
        val typ = fourcc(b, o.toInt + 4)
        var hdr = 8L
        if (size == 1 && o + 16 <= to) { size = be64(b, o.toInt + 8); hdr = 16 }
        else if (size == 0) size = to - o
        if (size < hdr || o + size > to) return
        val body = o + hdr
        // walk-level rule: every field read inside a box is bounded by
        // the box's OWN end, never the parent's — a truncated box must
        // yield nothing, not bytes read from its next sibling
        val bend = o + size
        typ match {
          case "ftyp" =>
            if (body + 4 <= bend) container = fourcc(b, body.toInt).trim
          case "moov" | "mdia" | "minf" | "stbl" =>
            if (depth < 8) walk(body, bend, depth + 1, inTrak)
          case "trak" =>
            curHandler = "" // each trak declares its own handler
            pendW = 0; pendH = 0
            pendTs = 0; pendSttsDur = 0; pendSttsN = 0
            pendSzN = 0; pendSzTotal = 0; pendSzMax = 0
            pendStsc = Vector.empty
            pendStss = -1L
            if (depth < 8) walk(body, bend, depth + 1, inTrak = true)
            // commit the stash now the handler is known: video trak dims
            // win (first video trak only); a handlerless trak's dims are
            // kept aside and used only if no vide trak ever provides any
            if (curHandler == "vide") {
              if (w == 0 && pendW > 0) { w = pendW; h = pendH }
            } else if (curHandler.isEmpty) {
              if (fbW == 0 && pendW > 0) { fbW = pendW; fbH = pendH }
            }
            // sample-table commit: exact track duration = Σ stts
            // (count·delta) rescaled by the mdhd media timescale (mvhd
            // movie duration legally differs across traks); exact fps
            // in millihertz = samples·timescale·1000 / Σduration; chunk
            // count reconstructed from stsc runs + the stsz sample
            // count (the last run extends to the remaining samples,
            // ISO 14496-12 §8.7.4)
            locally {
              // every product below goes through the saturating
              // helpers: a lying table yields 0, never a wrapped
              // negative (math.max maps the -1 overflow sentinel)
              val tdur = if (pendTs > 0 && pendSttsDur > 0)
                math.max(mulCap(pendSttsDur, 1000L), 0L) / pendTs else 0L
              val fps = if (pendSttsDur > 0 && pendTs > 0 && pendSttsN > 0)
                math.max(mulCap(mulCap(pendSttsN, pendTs), 1000L), 0L) /
                  pendSttsDur
              else 0L
              var chunks = 0L
              if (pendStsc.nonEmpty && pendSzN > 0) {
                var covered = 0L
                var i = 0
                while (i < pendStsc.length && covered >= 0 && chunks >= 0) {
                  val (fc, spc) = pendStsc(i)
                  if (spc > 0) {
                    if (i + 1 < pendStsc.length) {
                      val nch = pendStsc(i + 1)._1 - fc
                      if (nch > 0) {
                        chunks = addCap(chunks, nch)
                        covered = addCap(covered, mulCap(nch, spc))
                      }
                    } else if (pendSzN > covered) {
                      chunks = addCap(chunks,
                        (pendSzN - covered + spc - 1) / spc)
                    }
                  }
                  i += 1
                }
                chunks = math.max(chunks, 0L)
              }
              // sync-sample count: a present stss speaks for itself
              // (entries actually inside the box, a lying entry_count
              // is bounded like every other table); an ABSENT stss
              // means all samples are sync (§8.6.2), so the stsz
              // sample count is the exact answer
              val syncs = if (pendStss >= 0) pendStss else pendSzN
              val grp = (tdur, fps, pendSzTotal, pendSzMax, chunks, syncs)
              val hasSignal = tdur > 0 || fps > 0 || pendSzTotal > 0 ||
                chunks > 0 || syncs > 0
              if (hasSignal) curHandler match {
                case "vide" => if (vGrp == null) vGrp = grp
                case "soun" => if (aGrp == null) aGrp = grp
                case "" => if (anyGrp == null) anyGrp = grp
                case _ => () // text/hint/meta traks never commit
              }
            }
          case "hdlr" if body + 12 <= bend =>
            // ver/flags(4) pre_defined(4) handler_type(4)
            curHandler = fourcc(b, body.toInt + 8)
          case "mvhd" if body + 4 <= bend =>
            // all-ones duration = "cannot be determined" (ISO 14496-12
            // §8.2.2.3, common from live/fragmented muxers): keep the
            // promised 0, not a 49.7-day (v0) or negative (v1) figure
            val ver = u8(b, body.toInt)
            if (ver == 1 && body + 32 <= bend) {
              val ts = be32(b, body.toInt + 20)
              val dur = be64(b, body.toInt + 24)
              if (ts > 0 && dur >= 0) durMs = dur * 1000L / ts
            } else if (ver == 0 && body + 20 <= bend) {
              val ts = be32(b, body.toInt + 12)
              val dur = be32(b, body.toInt + 16)
              if (ts > 0 && dur != 0xffffffffL) durMs = dur * 1000L / ts
            }
          case "tkhd" =>
            // width/height are the LAST 8 bytes of the box, 16.16 fixed;
            // stashed per trak (first-wins), committed by the trak case
            val wOff = bend - 8
            if (wOff >= body) {
              val tw = (be32(b, wOff.toInt) >> 16).toInt
              val th = (be32(b, wOff.toInt + 4) >> 16).toInt
              if (tw > 0 && th > 0 && pendW == 0) { pendW = tw; pendH = th }
            }
          case "mdhd" if body + 4 <= bend =>
            // media timescale: v0 at offset 12 (after 4+4+4), v1 at 20
            // (after 4+8+8) — the unit stts durations are expressed in
            if (inTrak && pendTs == 0) {
              val ver = u8(b, body.toInt)
              if (ver == 1 && body + 24 <= bend)
                pendTs = be32(b, body.toInt + 20)
              else if (ver == 0 && body + 16 <= bend)
                pendTs = be32(b, body.toInt + 12)
            }
          case "stts" if body + 8 <= bend =>
            // time-to-sample runs: Σ count and Σ count·delta are the
            // exact sample count and track duration (media timescale).
            // Entry reads bounded by the box's own end — a table whose
            // declared entry_count overruns the box yields the partial
            // sums, never sibling bytes
            if (inTrak && pendSttsN == 0) {
              val n = be32(b, body.toInt + 4)
              var i = 0L; var off = body + 8
              var cnt = 0L; var dur = 0L
              while (i < n && off + 8 <= bend) {
                val sc = be32(b, off.toInt)
                val sd = be32(b, off.toInt + 4)
                cnt = addCap(cnt, sc)
                dur = addCap(dur, mulCap(sc, sd))
                i += 1; off += 8
              }
              // saturated sums (u32·u32 can exceed Long) commit as 0
              pendSttsN = math.max(cnt, 0L)
              pendSttsDur = math.max(dur, 0L)
            }
          case "stsc" if body + 8 <= bend =>
            // sample-to-chunk runs (first_chunk, samples_per_chunk,
            // desc_idx) — kept as runs; the chunk count needs the stsz
            // sample count, so it resolves at trak commit
            if (inTrak && pendStsc.isEmpty) {
              val n = be32(b, body.toInt + 4)
              var i = 0L; var off = body + 8
              val runs = Vector.newBuilder[(Long, Long)]
              while (i < n && off + 12 <= bend) {
                runs += ((be32(b, off.toInt), be32(b, off.toInt + 4)))
                i += 1; off += 12
              }
              pendStsc = runs.result()
            }
          case "stsz" if body + 12 <= bend =>
            if (inTrak) {
              val fixed = be32(b, body.toInt + 4) // nonzero = constant size
              val n = be32(b, body.toInt + 8)
              curHandler match {
                case "vide" => if (vSamples == 0) vSamples = n
                case "soun" => if (aSamples == 0) aSamples = n
                case "" => if (anySamples == 0) anySamples = n
                case _ => () // text/hint/meta traks never feed `frames`
              }
              // size totals: constant-size tracks multiply; variable
              // tracks walk the table, bounded by the box's own end
              if (pendSzN == 0 && n > 0) {
                pendSzN = n
                if (fixed > 0) {
                  // u32·u32 can exceed Long: saturate → 0, never wrap
                  pendSzTotal = math.max(mulCap(fixed, n), 0L)
                  pendSzMax = if (pendSzTotal > 0) fixed else 0L
                } else {
                  var i = 0L; var off = body + 12
                  var tot = 0L
                  while (i < n && off + 4 <= bend) {
                    val sz = be32(b, off.toInt)
                    tot = addCap(tot, sz)
                    if (sz > pendSzMax) pendSzMax = sz
                    i += 1; off += 4
                  }
                  pendSzTotal = math.max(tot, 0L)
                }
              }
            }
          case "stss" if body + 8 <= bend =>
            // sync-sample table: ver/flags(4) entry_count(4) then one
            // u32 sample number per random-access point. Only the
            // COUNT matters here, and only entries physically inside
            // the box count — a declared total overrunning the box
            // yields the present entries, never sibling bytes
            if (inTrak && pendStss < 0) {
              val n = be32(b, body.toInt + 4)
              pendStss = math.min(n, math.max(0L, (bend - body - 8) / 4))
            }
          case "stsd" if body + 16 <= bend =>
            val entryO = body + 8          // ver/flags + entry_count
            val fmt = fourcc(b, entryO.toInt + 4)
            // AudioSampleEntry: 4cc +4, reserved 6, dref 2,
            // version 2, rev 2, vendor 4, channels 2, bits 2,
            // compId 2, packet 2, samplerate 4 (16.16) — the ISO
            // 14496-12 §12.2.3 layout shared by EVERY audio entry
            // (mp4a, ec-3, lpcm, .mp3, ...), so the generic read is
            // spec-correct once hdlr says 'soun'
            // FIRST-wins like the video side and the EBML tracks, so a
            // multi-audio-trak file reports codec, channels, rate and
            // (via aSamples) frames all from the SAME trak
            def audioEntry(): Unit = if (aCodec.isEmpty) {
              aCodec = fmt.trim
              if (entryO + 36 <= bend) {
                ch = be16(b, entryO.toInt + 24)
                sr = (be32(b, entryO.toInt + 32) >> 16).toInt
              }
            }
            curHandler match {
              case "soun" if fmt.nonEmpty => audioEntry()
              case "vide" if fmt.nonEmpty =>
                if (vCodec.isEmpty) vCodec = fmt.trim
              case "" => fmt match { // hdlr ABSENT only: fourcc fallback
                // 'Opus' is the REGISTERED capitalization (Opus-in-ISOBMFF
                // §4.3.2) — a lowercase arm would never match real files
                case "mp4a" | "Opus" | "ac-3" | "alac" | "fLaC" | "sowt"
                    | "twos" | "ulaw" => audioEntry()
                case other if other.nonEmpty =>
                  if (vCodec.isEmpty) vCodec = other.trim
                case _ => ()
              }
              // a PRESENT non-AV handler (text/sbtl/hint/meta/tmcd …)
              // must not leak its entry into the A/V codec fields — a
              // chapter trak's 'tx3g' listed before the video trak
              // would otherwise masquerade as the stream codec
              case _ => ()
            }
          case _ => ()
        }
        o += size
      }
    }
    walk(0, b.length.toLong, 0, inTrak = false)
    if (w == 0 && fbW > 0) { w = fbW; h = fbH } // no vide trak spoke up
    if (durMs == 0 && vCodec.isEmpty && aCodec.isEmpty) None
    else {
      val grp = if (vGrp != null) vGrp
        else if (aGrp != null) aGrp
        else if (anyGrp != null) anyGrp
        else (0L, 0L, 0L, 0L, 0L, 0L)
      Some(MediaInfo(container,
        if (vCodec.nonEmpty) vCodec else if (aCodec.nonEmpty) aCodec else "",
        sr, ch, if (durMs > 0) (b.length * 8L / durMs).toInt else 0,
        durMs, w, h,
        if (vSamples > 0) vSamples
        else if (aSamples > 0) aSamples else anySamples,
        trackDurMs = grp._1, fpsMilli = grp._2,
        sampleBytes = grp._3, maxSampleBytes = grp._4, chunks = grp._5,
        syncSamples = grp._6))
    }
  }

  // ------------------------------------------------- EBML (webm / mkv)

  /** EBML / Matroska / WebM probe (RFC 8794 element framing + the
    * Matroska element IDs): DocType from the EBML header, then inside
    * Segment → Info (TimecodeScale, Duration) and Tracks → TrackEntry
    * (CodecID, Video PixelWidth/PixelHeight, Audio SamplingFrequency/
    * Channels), plus the Cues seek index whose CuePoint count is the
    * random-access-point signal (`syncSamples` — the Matroska twin of
    * the mp4 stss count). Pure length-prefixed tree walking like the mp4 box
    * probe — cluster payloads are skipped by their declared size, so
    * cost is O(#elements), not O(bytes). Unknown-size elements (legal
    * for Segment in live captures) extend to the end of the input. */
  private def probeEbml(b: Array[Byte]): Option[MediaInfo] = {
    if (b.length < 8 || be32(b, 0) != 0x1a45dfa3L) return None
    // VINT length from the leading byte (leading-zero count + 1)
    def vlen(b0: Int): Int =
      if (b0 >= 0x80) 1 else if (b0 >= 0x40) 2 else if (b0 >= 0x20) 3
      else if (b0 >= 0x10) 4 else if (b0 >= 0x08) 5 else if (b0 >= 0x04) 6
      else if (b0 >= 0x02) 7 else if (b0 == 1) 8 else 0
    // element ID: marker bit KEPT (IDs are conventionally full bytes)
    def readId(o: Int): (Long, Int) = {
      if (o >= b.length) return (0L, 0)
      val n = vlen(u8(b, o))
      if (n == 0 || o + n > b.length) return (0L, 0)
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | u8(b, o + i); i += 1 }
      (v, n)
    }
    // element size: marker bit STRIPPED; all-ones payload = unknown
    def readSize(o: Int): (Long, Int) = {
      if (o >= b.length) return (-1L, 0)
      val n = vlen(u8(b, o))
      if (n == 0 || o + n > b.length) return (-1L, 0)
      var v = (u8(b, o) & (0xff >> n)).toLong; var i = 1
      while (i < n) { v = (v << 8) | u8(b, o + i); i += 1 }
      val unknown = v == (1L << (7 * n)) - 1
      (if (unknown) -2L else v, n)
    }
    def uint(o: Int, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len && i < 8) { v = (v << 8) | u8(b, o + i); i += 1 }
      v
    }
    def fp(o: Int, len: Int): Double =
      if (len == 4) java.lang.Float.intBitsToFloat(be32(b, o).toInt).toDouble
      else if (len == 8) java.lang.Double.longBitsToDouble(be64(b, o))
      else 0.0
    var docType = ""; var codecV = ""; var codecA = ""
    var scaleNs = 1000000L; var durTicks = 0.0
    var w = 0; var h = 0; var sr = 0; var ch = 0
    var cuePoints = 0L
    var guard = 0
    // trackType of the entry currently being walked (1 video, 2 audio)
    def walk(from: Int, to: Int, depth: Int, inTrack: Boolean): Unit = {
      var o = from
      while (o < to && guard < 4096) {
        guard += 1
        val (id, idLen) = readId(o)
        if (idLen == 0) return
        val (sz0, szLen) = readSize(o + idLen)
        if (szLen == 0) return
        val body = o + idLen + szLen
        val sz = if (sz0 == -2L) (to - body).toLong
          else if (sz0 < 0 || body + sz0 > to) return else sz0
        val end = (body + sz).toInt
        id match {
          case 0x1a45dfa3L | 0x18538067L | 0x1549a966L | 0x1654ae6bL =>
            if (depth < 8) walk(body, end, depth + 1, inTrack)
          case 0xaeL => // TrackEntry
            if (depth < 8) walk(body, end, depth + 1, inTrack = true)
          case 0xe0L | 0xe1L => // Video / Audio settings
            if (depth < 8) walk(body, end, depth + 1, inTrack)
          // Cues: the seek/keyframe index. Each CuePoint (0xBB — that
          // id means CuePoint only inside Cues) indexes one random-
          // access point, the Matroska twin of the mp4 stss count.
          // Counted by a DEDICATED flat loop with its own bound, not
          // by descending walk(): a real index easily holds 10^4–10^5
          // CuePoints (one per keyframe of a 2 h movie), which would
          // exhaust the global 4096-element guard mid-count — silently
          // wrong syncSamples AND an aborted parse of every element
          // after Cues. The flat loop is O(#entries) skips, entries
          // are never descended, and the count caps at 2^20 (a lying
          // index cannot spin the prefix probe).
          case 0x1c53bb6bL =>
            var co = body
            while (co < end && cuePoints < (1L << 20)) {
              val (cid, cidLen) = readId(co)
              if (cidLen == 0) { co = end } else {
                val (csz, cszLen) = readSize(co + cidLen)
                val cbody = co + cidLen + cszLen
                if (cszLen == 0 || csz < 0 || cbody + csz > end) co = end
                else {
                  if (cid == 0xbbL) cuePoints += 1
                  co = (cbody + csz).toInt
                }
              }
            }
          case 0x4282L => // DocType
            docType = new String(b, body, sz.toInt,
              java.nio.charset.StandardCharsets.ISO_8859_1).trim
          case 0x2ad7b1L => scaleNs = uint(body, sz.toInt)
          case 0x4489L => durTicks = fp(body, sz.toInt)
          case 0x86L if inTrack => // CodecID
            val c = new String(b, body, sz.toInt,
              java.nio.charset.StandardCharsets.ISO_8859_1).trim
            if (c.startsWith("V_") && codecV.isEmpty) codecV = c
            else if (c.startsWith("A_") && codecA.isEmpty) codecA = c
          // first-wins like CodecID: a second video track (thumbnail,
          // multi-angle) must not overwrite the kept track's dims with
          // its own, or the record mixes fields from different tracks
          case 0xb0L if inTrack && w == 0 => w = uint(body, sz.toInt).toInt
          case 0xbaL if inTrack && h == 0 => h = uint(body, sz.toInt).toInt
          case 0xb5L if inTrack && sr == 0 => sr = fp(body, sz.toInt).toInt
          case 0x9fL if inTrack && ch == 0 => ch = uint(body, sz.toInt).toInt
          case _ => () // skip (Cluster, SeekHead, Void, ...)
        }
        o = end
      }
    }
    walk(0, b.length, 0, inTrack = false)
    if (docType.isEmpty) return None
    val durMs = (durTicks * scaleNs / 1e6).toLong
    Some(MediaInfo(docType,
      if (codecV.nonEmpty) codecV else codecA, sr, ch,
      if (durMs > 0) (b.length * 8L / durMs).toInt else 0,
      durMs, w, h, 0L, syncSamples = cuePoints))
  }

  // ------------------------------------------------------------- Ogg

  /** Ogg page walk (RFC 3533): identify the coded stream from the first
    * packet's magic (Vorbis id header / OpusHead / OggS-framed FLAC)
    * and read the LAST page's granule position — PCM sample count for
    * Vorbis, 48 kHz ticks for Opus — for an exact duration without
    * decoding a single packet. */
  private def probeOgg(b: Array[Byte]): Option[MediaInfo] = {
    if (!matches(b, 0, "OggS") || b.length < 28) return None
    val nseg0 = u8(b, 26)
    val p0 = 27 + nseg0
    var codec = ""; var sr = 0; var ch = 0
    // id-header extras (no DSP — pure header fields): Opus pre-skip
    // (RFC 7845 §5.1: 48 kHz samples the decoder must drop, and §4.2:
    // the final granule INCLUDES them, so playback duration is
    // granule − pre-skip) and Vorbis bitrate_nominal (Vorbis I
    // §4.2.2: the encoder's declared rate — truer than bytes/duration
    // when the probe sees only a prefix window of the clip)
    var preSkip = 0
    var brDeclared = 0
    // the FIRST packet's byte length from the lacing table (values
    // sum; the first value < 255 terminates it, RFC 3533 §5): every
    // id-header field read below is bounded by the PACKET end, not
    // the buffer end — a truncated id packet must degrade to
    // codec-only identification, never read the next page's capture
    // pattern as channels/pre-skip/bitrate
    var pkt0 = 0
    locally {
      // the lacing walk itself must be buffer-bounded: the entry guard
      // only promises 28 bytes, and nseg0 can be up to 255 — a window
      // truncated INSIDE the segment table (trailing 0xFF lacing
      // values) must not read past the buffer. A truncated table means
      // the packet length is unknowable; the reads below then degrade
      // via the pEnd bound (p0 past the buffer fails every field
      // check), honoring the bounded-output-on-any-input contract.
      var s = 0; var open = true
      while (s < nseg0 && open && 27 + s < b.length) {
        val v = u8(b, 27 + s)
        pkt0 += v; if (v < 255) open = false
        s += 1
      }
    }
    val pEnd = math.min(b.length, p0 + pkt0)
    // Vorbis id packet = [0x01]"vorbis" (Vorbis I §4.2.1: the packet
    // TYPE byte precedes the magic) — type byte checked explicitly, not
    // embedded in the literal, so the offset arithmetic below (channels
    // at p0+11, rate at p0+12, both relative to the type byte) is
    // visibly consistent with the match
    if (p0 + 7 <= pEnd && u8(b, p0) == 0x01 &&
        matches(b, p0 + 1, "vorbis")) {
      codec = "vorbis"
      if (p0 + 16 <= pEnd) {
        ch = u8(b, p0 + 11); sr = le32(b, p0 + 12).toInt
      }
      // [br_max, br_nom, br_min] follow the rate; only the nominal is
      // trustworthy as a summary figure — and these are SIGNED fields
      // whose "unset" sentinel is -1 (0xFFFFFFFF), so the unsigned
      // read must reject the high-bit range, not min-clamp it into a
      // fictitious ~1 Gbps declared rate
      if (p0 + 24 <= pEnd) {
        val nom = le32(b, p0 + 20)
        if (nom > 0 && nom < 0x80000000L)
          brDeclared = math.min(nom / 1000L, 1 << 20).toInt
      }
    } else if (p0 + 8 <= pEnd && matches(b, p0, "OpusHead")) {
      // OpusHead really is the first packet byte (RFC 7845 §5.1)
      codec = "opus"
      if (p0 + 12 <= pEnd) {
        ch = u8(b, p0 + 9); sr = 48000; preSkip = le16(b, p0 + 10)
      }
    } else if (p0 + 5 <= pEnd && u8(b, p0) == 0x7f &&
        matches(b, p0 + 1, "FLAC")) {
      // Ogg-FLAC mapping packet: 0x7F "FLAC" maj min nHdr(2), then a
      // VERBATIM native-FLAC prefix ("fLaC" + STREAMINFO) at p0+9 —
      // reuse the native header probe on that slice for rate/channels
      codec = "flac"
      val fo = p0 + 9
      if (fo < pEnd)
        probeFlacHeader(java.util.Arrays.copyOfRange(b, fo,
          math.min(pEnd, fo + 46))).foreach { fi =>
          sr = fi.sampleRate; ch = fi.channels
        }
    }
    if (codec.isEmpty) return None
    // last page's granule: scan backwards for the final OggS capture.
    // 'OggS' can legitimately occur INSIDE compressed packet payloads
    // (~once per 4 GB of random bytes — real at corpus scale), so a
    // candidate only counts as the page header if the fixed fields
    // hold: version byte 0 (RFC 3533 §6), header-type flags confined
    // to bits 0-2, and the full 27+nseg header in bounds.
    def isPageHeader(i: Int): Boolean =
      i + 27 <= b.length && u8(b, i + 4) == 0 &&
        (u8(b, i + 5) & 0xf8) == 0 && i + 27 + u8(b, i + 26) <= b.length
    var last = -1
    var i = b.length - 27
    while (last < 0 && i >= 0) {
      if (matches(b, i, "OggS") && isPageHeader(i)) last = i else i -= 1
    }
    val granule = if (last >= 0 && last + 14 <= b.length) le64(b, last + 6) else 0L
    // AUDIO packet count (r12, the `frames` field): forward page walk
    // counting packets that COMPLETE on each page (lacing values
    // < 255, RFC 3533 §5) — restricted to the IDENTIFIED stream:
    // only pages carrying the first page's serial number (a
    // multiplexed file's other logical streams — Theora video,
    // metadata — have their own serials and must not inflate the
    // audio count), and only pages whose granule position is > 0
    // (header packets complete on granule-0 pages by the mapping
    // specs; a continued-packet-only page carries granule -1 — both
    // excluded without hardcoding any per-codec header-packet count).
    // A BOS page (header-type bit 0x02) appearing after a non-BOS
    // page marks a CHAINED stream whose granules reset (in a grouped
    // mux ALL streams' BOS pages come first, RFC 3533 §4, so those
    // are not boundaries); the walk stops there so frames describes
    // the first chain. A corrupt/truncated middle page ends the count
    // at the coherent prefix, like every other walk.
    val serial0 = le32(b, 14)
    var pkts = 0L
    var chainGran = 0L // last matching-serial granule inside chain 1
    var chained = false
    var seenData = false // a non-BOS page has been walked
    var pp = 0
    var guard = 0
    while (pp >= 0 && pp + 27 <= b.length && matches(b, pp, "OggS") &&
        isPageHeader(pp) && guard < (1 << 20)) {
      guard += 1
      val bos = (u8(b, pp + 5) & 0x02) != 0
      if (bos && seenData) { chained = true; pp = -1 }
      else {
        if (!bos) seenData = true
        val nseg = u8(b, pp + 26)
        val gran = le64(b, pp + 6)
        var sum = 0L; var completed = 0L
        var s = 0
        while (s < nseg) {
          val v = u8(b, pp + 27 + s)
          sum += v; if (v < 255) completed += 1; s += 1
        }
        if (gran > 0 && le32(b, pp + 14) == serial0) {
          pkts += completed
          chainGran = gran
        }
        val next = pp.toLong + 27 + nseg + sum
        pp = if (next > b.length.toLong) -1 else next.toInt
      }
    }
    // duration: normally the LAST page's granule (robust when a probe
    // window truncates the middle — the backward scan still finds the
    // final intact page); on a CHAINED file granules reset per chain,
    // so the last-chain granule would be inconsistent with the
    // first-chain packet count — use chain 1's own last granule, the
    // same stream `frames` describes.
    val effGran = if (chained) chainGran else granule
    val durMs =
      if (codec == "opus" && effGran > 0)
        // granule counts pre-skip samples; playback does not (§4.2).
        // A lying pre-skip larger than the whole granule clamps to 0
        // rather than wrapping the duration negative.
        math.max(0L, effGran - preSkip) * 1000L / 48000L
      else if (sr > 0 && effGran > 0) effGran * 1000L / sr
      else 0L
    Some(MediaInfo("ogg", codec, sr, ch,
      if (brDeclared > 0) brDeclared
      else if (durMs > 0) (b.length * 8L / durMs).toInt else 0,
      durMs, 0, 0, pkts))
  }

  // ---------------------------------------------- AIFF / AU (Apple / Sun)

  /** 80-bit IEEE 754 extended float → nearest non-negative Int (the
    * AIFF COMM sample-rate field — the format's one exotic encoding).
    * Layout: sign(1) exponent(15) mantissa(64, EXPLICIT integer bit);
    * value = m · 2^(e − 16383 − 63). Real rates are exact integers
    * (44100 = 0x400E:0xAC44…), so the parse is pure integer shifts
    * with round-half-up on the dropped bit; negative, ≥ 2^31, or
    * subnormal-tiny values clamp to 0 ("unknown") — bounded output on
    * any 10 bytes, like every other probe field. */
  private def ext80(b: Array[Byte], o: Int): Int = {
    if (o + 10 > b.length) return 0
    val se = be16(b, o)
    if ((se & 0x8000) != 0) return 0 // a negative sample rate is nonsense
    val e = se & 0x7fff
    val m = be64(b, o + 2) // top bit = the explicit integer bit
    if (m == 0L) return 0
    val shift = 16383 + 63 - e
    if (shift < 0 || shift > 63) return 0 // >= 2^64 or vanishingly small
    val half = if (shift > 0 && ((m >>> (shift - 1)) & 1L) == 1L) 1L else 0L
    val r = (m >>> shift) + half
    if (r > Int.MaxValue || r < 0) 0 else r.toInt
  }

  /** AIFF / AIFF-C probe (EA IFF 85 framing): 'FORM' size 'AIFF'|'AIFC'
    * then even-padded big-endian chunks. COMM carries channels,
    * numSampleFrames, sampleSize bits and the [[ext80]] sample rate;
    * AIFC's COMM additionally names a compression fourcc ('NONE' =
    * big-endian pcm, 'sowt' = byte-swapped little-endian pcm,
    * 'ulaw'/'alaw' = G.711 — all decodable in this JVM via
    * javax.sound, so identifying them here is what routes the row to
    * the real decode stage). Duration = numSampleFrames / rate —
    * exact container structure, no sample touched. The declared FORM
    * size caps the walk; a lying chunk size ends it at the coherent
    * prefix. */
  private def probeAiff(b: Array[Byte]): Option[MediaInfo] = {
    if (b.length < 12 || !matches(b, 0, "FORM")) return None
    val kind = fourcc(b, 8)
    if (kind != "AIFF" && kind != "AIFC") return None
    var ch = 0; var frames = 0L; var bits = 0; var sr = 0
    var codec = ""
    val lim = math.min(b.length.toLong, addCap(8L, be32(b, 4)) match {
      case n if n < 0 => b.length.toLong
      case n => n
    })
    var o = 12L
    while (o + 8 <= lim) {
      val cid = fourcc(b, o.toInt)
      val sz = be32(b, o.toInt + 4)
      if (cid == "COMM" && sz >= 18 && o + 8 + 18 <= b.length) {
        val co = o.toInt + 8
        // field sanity mirrors probeAu: a hostile COMM (0 or 65535
        // channels, 0-bit samples) must not mint a codec name
        val c0 = be16(b, co)
        val b0 = be16(b, co + 6)
        if (c0 >= 1 && c0 <= 64 && b0 >= 1 && b0 <= 64) {
          ch = c0
          frames = be32(b, co + 2)
          bits = b0
          sr = ext80(b, co + 8)
          codec =
            if (kind == "AIFC" && sz >= 22 && o + 8 + 22 <= b.length)
              fourcc(b, co + 18) match {
                case "NONE" => s"pcm_s${bits}be"
                case "sowt" => s"pcm_s${bits}le"
                case other =>
                  other.trim.toLowerCase(java.util.Locale.ROOT)
              }
            else s"pcm_s${bits}be"
        }
      }
      // be32 is unsigned, so sz >= 0 always: the walk terminates by o
      // overshooting lim (a lying size jumps past it — the coherent
      // prefix stands)
      o += 8L + sz + (sz & 1L) // chunks are even-padded
    }
    if (codec.isEmpty) return None
    // probeMp3's hostile-tag clamp: u32 frames over a 1 Hz ext80 rate
    // would otherwise declare a ~136-year duration
    val durMs =
      if (sr > 0) math.min(frames * 1000L / sr, 0xffffffffL) else 0L
    val kbps = // declared-rate exact figure for pcm, window-independent
      if (sr > 0 && ch > 0 && bits > 0)
        math.min(sr.toLong * ch * bits / 1000L, Int.MaxValue.toLong).toInt
      else 0
    Some(MediaInfo(kind.toLowerCase(java.util.Locale.ROOT), codec,
      sr, ch, kbps, durMs, 0, 0, frames))
  }

  /** Sun AU / .snd probe: a fixed 24-byte big-endian header — magic,
    * data offset, data size, encoding, sample rate, channels — is the
    * whole container. Encoding 1 is G.711 µ-law (1 byte/sample,
    * decodable here via javax.sound), 27 A-law, 2–5 s8..s32 pcm, 6/7
    * ieee float/double. Duration = size / (rate·ch·bytesPerSample),
    * exact; a declared size of 0xFFFFFFFF legally means "to EOF", and
    * any size overrunning the buffer is clamped to the bytes actually
    * present (probe-window truncation must shrink the answer, never
    * invent samples). */
  private def probeAu(b: Array[Byte]): Option[MediaInfo] = {
    if (b.length < 24 || !matches(b, 0, ".snd")) return None
    val off = be32(b, 4)
    val size = be32(b, 8)
    val enc = be32(b, 12)
    val sr = be32(b, 16)
    val ch = be32(b, 20)
    val (codec, bytesPer) = enc match {
      case 1L => ("ulaw", 1); case 2L => ("pcm_s8", 1)
      case 3L => ("pcm_s16be", 2); case 4L => ("pcm_s24be", 3)
      case 5L => ("pcm_s32be", 4); case 6L => ("pcm_f32be", 4)
      case 7L => ("pcm_f64be", 8); case 27L => ("alaw", 1)
      case _ => return None
    }
    if (sr <= 0 || sr > Int.MaxValue || ch <= 0 || ch > 64) return None
    // offset below the fixed header is malformed -> treat as 24; an
    // offset BEYOND the buffer means the audio bytes are outside this
    // probe window -> zero samples ("clamp, never invent"), not a
    // silent re-base onto annotation/junk bytes
    val start = if (off < 24) 24L else math.min(off, b.length.toLong)
    val avail = b.length - start
    val dataLen =
      if (size == 0xffffffffL || size > avail) math.max(0L, avail)
      else size
    val samples = dataLen / (bytesPer.toLong * ch)
    val durMs = samples * 1000L / sr
    val kbps = math.min(sr * ch * bytesPer * 8L / 1000L,
      Int.MaxValue.toLong).toInt
    Some(MediaInfo("au", codec, sr.toInt, ch.toInt, kbps, durMs,
      0, 0, samples))
  }

  // ------------------------------------------------- RIFF (wav / avi)

  /** RIFF probe: a WAV's fmt chunk (codec tag, channels, rate, byte
    * rate) + data chunk size → exact duration for PCM-family tags; an
    * AVI's avih (frame period, total frames) + first stream format. */
  private def probeRiff(b: Array[Byte]): Option[MediaInfo] = {
    if (!matches(b, 0, "RIFF") || b.length < 12) return None
    val form = fourcc(b, 8)
    if (form == "WAVE") {
      // shared walker (RiffWav): Long-space advance, stops (not aborts)
      // on an unwalkable declared size; the DECLARED data size feeds the
      // duration — a probe may see only a prefix window of the clip
      val w = RiffWav.parse(b).getOrElse(return None)
      // <= 0, not == 0: a declared rate >= 2^31 truncates negative as
      // an Int and must not pass into the "valid info record" contract
      if (w.rate <= 0) return None
      val codec = w.fmtTag match {
        case 1 => "pcm"; case 2 => "ms-adpcm"; case 3 => "pcm-float"
        case 6 => "alaw"; case 7 => "ulaw"; case 0x11 => "ima-adpcm"
        case 0x55 => "mp3"; case t => f"tag-0x$t%04x"
      }
      val durMs =
        if (w.byteRate > 0) w.dataDeclared * 1000L / w.byteRate else 0L
      Some(MediaInfo("wav", codec, w.rate, w.channels,
        (w.byteRate * 8 / 1000).toInt, durMs, 0, 0, 0L))
    } else if (form == "AVI ") {
      var usPerFrame = 0L; var frames = 0L; var w = 0; var h = 0
      var codec = ""
      def walk(from: Int, to: Int, depth: Int): Unit = {
        var p = from
        while (p + 8 <= to && depth < 8) {
          // size stays a Long: a declared size near 2^32 truncated to
          // Int would pass a signed bound check after overflow and walk
          // the cursor negative (same class of stall/crash as the WAV
          // chunk walk — MediaProbeSpec pins both)
          val id = fourcc(b, p); val sz = le32(b, p + 4)
          if (p + 8L + sz > to) return
          val end = (p + 8L + sz).toInt
          if (id == "LIST") walk(p + 12, end, depth + 1)
          else if (id == "avih" && p + 8 + 40 <= to) {
            usPerFrame = le32(b, p + 8); frames = le32(b, p + 24)
            w = le32(b, p + 40).toInt; h = le32(b, p + 44).toInt
          } else if (id == "strh" && p + 8 + 8 <= to &&
              fourcc(b, p + 8) == "vids" && codec.isEmpty)
            codec = fourcc(b, p + 12).trim.toLowerCase
          p = end + (sz & 1).toInt
        }
      }
      walk(12, b.length, 0)
      if (usPerFrame == 0 && frames == 0) return None
      val durMs = usPerFrame * frames / 1000L
      Some(MediaInfo("avi", codec, 0, 0,
        if (durMs > 0) (b.length * 8L / durMs).toInt else 0,
        durMs, w, h, frames))
    } else None
  }

  // ------------------------------------------------ FLAC / GIF headers

  /** Native-FLAC STREAMINFO: rate (20 bits), channels (3 bits + 1) and
    * total samples (36 bits) at fixed bit offsets — duration without
    * touching a single audio frame. */
  private def probeFlacHeader(b: Array[Byte]): Option[MediaInfo] = {
    if (!matches(b, 0, "fLaC") || b.length < 4 + 4 + 34) return None
    if ((u8(b, 4) & 0x7f) != 0) return None // first block must be STREAMINFO
    val si = 8 // STREAMINFO payload offset
    // bytes si+10..si+17: rate(20) chan(3) bps(5) totalSamples(36)
    val sr = (u8(b, si + 10) << 12) | (u8(b, si + 11) << 4) |
      (u8(b, si + 12) >> 4)
    val ch = ((u8(b, si + 12) >> 1) & 7) + 1
    val total = ((u8(b, si + 13) & 0x0f).toLong << 32) |
      (be32(b, si + 14) & 0xffffffffL)
    if (sr == 0) return None
    Some(MediaInfo("flac", "flac", sr, ch,
      0, total * 1000L / sr, 0, 0, total))
  }

  /** GIF logical screen size, frame count and total animation duration
    * by walking the block structure (image descriptors, extension
    * sub-blocks, graphic-control delays) — exact, without LZW decode:
    * the pixel data is length-prefixed sub-blocks we skip over. */
  private def probeGifHeader(b: Array[Byte]): Option[MediaInfo] = {
    if (!(matches(b, 0, "GIF87a") || matches(b, 0, "GIF89a"))) return None
    if (b.length < 13) return None
    val w = le16(b, 6); val h = le16(b, 8)
    var i = 13
    if ((u8(b, 10) & 0x80) != 0) i += 3 * (1 << ((u8(b, 10) & 7) + 1))
    var frames = 0L; var durMs = 0L
    def skipSubBlocks(from: Int): Int = {
      var p = from
      while (p < b.length && u8(b, p) != 0) p += 1 + u8(b, p)
      p + 1
    }
    var done = false
    while (!done && i < b.length) u8(b, i) match {
      case 0x2c => // image descriptor: 9 bytes + local table + lzw data
        frames += 1
        if (i + 10 > b.length) done = true
        else {
          var p = i + 10
          if ((u8(b, i + 9) & 0x80) != 0)
            p += 3 * (1 << ((u8(b, i + 9) & 7) + 1))
          i = skipSubBlocks(p + 1) // +1: LZW minimum code size byte
        }
      case 0x21 => // extension: label byte, then sub-blocks
        if (i + 2 < b.length && u8(b, i + 1) == 0xf9 && i + 5 < b.length)
          durMs += le16(b, i + 4) * 10L // graphic control delay, 1/100 s
        i = skipSubBlocks(i + 2)
      case 0x3b => done = true
      case _ => done = true // malformed tail: report what was walked
    }
    Some(MediaInfo("gif", "gif-lzw", 0, 0, 0, durMs, w, h, frames))
  }
}
