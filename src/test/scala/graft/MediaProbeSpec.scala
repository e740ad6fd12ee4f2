package graft

import graft.pipeline.{AudioOps, MediaProbe, Multimodal}
import MediaProbe.MediaInfo
import java.io.ByteArrayOutputStream

/** Structural media-probe tests: every fixture is constructed here,
  * byte-by-byte from the PUBLIC container layouts (MPEG audio frame
  * header, ISO-BMFF boxes, Ogg pages, RIFF chunks, FLAC STREAMINFO,
  * GIF blocks), so each assertion checks the probe against the layout
  * spec rather than against the probe's own output. Totality is fuzzed
  * (random bytes + every truncation of every fixture).
  */
class MediaProbeSpec extends SparkSpec {

  // ---------------------------------------------------------- builders

  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
    (v >> 8).toByte, v.toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)
  private def le64(v: Long) = le32(v & 0xffffffffL) ++ le32(v >>> 32)
  private def cc(s: String) = s.getBytes("ISO-8859-1")

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    parts.foreach(o.write)
    o.toByteArray
  }

  /** One MPEG-1 Layer III frame: 44.1 kHz, 128 kbps, stereo, no pad →
    * frame length 144*128000/44100 = 417 bytes. */
  private def mp3Frame(fill: Byte = 0x55): Array[Byte] = {
    val f = Array.fill[Byte](417)(fill)
    f(0) = 0xff.toByte; f(1) = 0xfb.toByte // sync + V1 + LIII + no-CRC
    f(2) = 0x90.toByte                     // brIdx 9 (=128), srIdx 0, pad 0
    f(3) = 0x00                            // stereo
    f
  }

  private def mp3Stream(n: Int): Array[Byte] =
    cat((0 until n).map(i => mp3Frame((i + 1).toByte)): _*)

  private def box(typ: String, body: Array[Byte]): Array[Byte] =
    cat(be32(body.length + 8L), cc(typ), body)

  /** Minimal mp4: ftyp + moov(mvhd v0 ts=1000 dur=5000,
    * trak(tkhd 640x360, mdia(minf(stbl(stsd avc1, stsz n=150))))). */
  private def mp4Fixture(): Array[Byte] = {
    val ftyp = box("ftyp", cat(cc("isom"), be32(512), cc("isom")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(1000), be32(5000), Array.fill[Byte](80)(0)))
    val tkhd = box("tkhd", cat(be32(0), Array.fill[Byte](72)(0),
      be32(640L << 16), be32(360L << 16)))
    val stsdEntry = cat(be32(86), cc("avc1"), Array.fill[Byte](78)(0))
    val stsd = box("stsd", cat(be32(0), be32(1), stsdEntry))
    val stsz = box("stsz", cat(be32(0), be32(0), be32(150)))
    val stbl = box("stbl", cat(stsd, stsz))
    val minf = box("minf", stbl)
    val hdlr = box("hdlr", cat(be32(0), be32(0), cc("vide"),
      Array.fill[Byte](13)(0)))
    val mdia = box("mdia", cat(hdlr, minf))
    val trak = box("trak", cat(tkhd, mdia))
    val moov = box("moov", cat(mvhd, trak))
    val mdat = box("mdat", Array.fill[Byte](64)(7))
    cat(ftyp, mdat, moov) // moov AFTER mdat: the walker must skip, not scan
  }

  /** m4a-style audio track: stsd entry mp4a, 2 ch, 44100 Hz (16.16). */
  private def m4aFixture(): Array[Byte] = {
    val ftyp = box("ftyp", cat(cc("M4A "), be32(0), cc("M4A ")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(44100), be32(441000), Array.fill[Byte](80)(0)))
    val entry = cat(be32(36 + 8), cc("mp4a"), Array.fill[Byte](6)(0),
      be16(1), be16(0), be16(0), be32(0), be16(2), be16(16), be16(0),
      be16(0), be32(44100L << 16))
    val stsd = box("stsd", cat(be32(0), be32(1), entry))
    val stbl = box("stbl", stsd)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", mdia)
    val moov = box("moov", cat(mvhd, trak))
    cat(ftyp, moov)
  }

  /** Ogg Opus: id page (OpusHead, 2ch) + a data page with granule. */
  private def oggOpusFixture(granule: Long): Array[Byte] = {
    def page(gran: Long, payload: Array[Byte]): Array[Byte] =
      cat(cc("OggS"), Array[Byte](0, 2), le64(gran), le32(1), le32(0),
        le32(0), Array[Byte](1, payload.length.toByte), payload)
    val head = cat(cc("OpusHead"), Array[Byte](1, 2), le16(312),
      le32(48000), le16(0), Array[Byte](0))
    cat(page(0, head), page(granule, Array.fill[Byte](20)(3)))
  }

  /** Ogg Vorbis: id page whose first packet is the Vorbis id header —
    * packet TYPE byte 0x01 then "vorbis" (Vorbis I §4.2.1), version,
    * channels u8, rate u32le — plus a data page with a granule. */
  private def oggVorbisFixture(granule: Long): Array[Byte] = {
    def page(gran: Long, payload: Array[Byte]): Array[Byte] =
      cat(cc("OggS"), Array[Byte](0, 2), le64(gran), le32(1), le32(0),
        le32(0), Array[Byte](1, payload.length.toByte), payload)
    val head = cat(Array[Byte](0x01), cc("vorbis"), le32(0),
      Array[Byte](2), le32(44100), le32(0), le32(128000), le32(0),
      Array[Byte](0xb8.toByte, 0x01))
    cat(page(0, head), page(granule, Array.fill[Byte](20)(3)))
  }

  /** Ogg FLAC: mapping packet 0x7F "FLAC" maj min nHdr(2) then the
    * verbatim native-FLAC prefix (the flacFixture itself). */
  private def oggFlacFixture(granule: Long): Array[Byte] = {
    def page(gran: Long, payload: Array[Byte]): Array[Byte] =
      cat(cc("OggS"), Array[Byte](0, 2), le64(gran), le32(1), le32(0),
        le32(0), Array[Byte](1, payload.length.toByte), payload)
    val head = cat(Array[Byte](0x7f), cc("FLAC"), Array[Byte](1, 0),
      be16(1), flacFixture())
    cat(page(0, head), page(granule, Array.fill[Byte](20)(3)))
  }

  /** mp4 with an ec-3 audio trak (hdlr 'soun') BEFORE an avc1 video
    * trak (hdlr 'vide'): hdlr-based routing must keep avc1 as the video
    * codec and read channels/rate from the non-whitelisted audio entry. */
  private def mp4TwoTrakFixture(): Array[Byte] = {
    val ftyp = box("ftyp", cat(cc("isom"), be32(512), cc("isom")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(1000), be32(5000), Array.fill[Byte](80)(0)))
    def trakOf(handler: String, entry: Array[Byte]): Array[Byte] = {
      val stsd = box("stsd", cat(be32(0), be32(1), entry))
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val hdlr = box("hdlr", cat(be32(0), be32(0), cc(handler),
        Array.fill[Byte](13)(0)))
      box("trak", box("mdia", cat(hdlr, minf)))
    }
    val audioEntry = cat(be32(36 + 8), cc("ec-3"), Array.fill[Byte](6)(0),
      be16(1), be16(0), be16(0), be32(0), be16(6), be16(16), be16(0),
      be16(0), be32(48000L << 16))
    val videoEntry = cat(be32(86), cc("avc1"), Array.fill[Byte](78)(0))
    val moov = box("moov", cat(mvhd,
      trakOf("soun", audioEntry), trakOf("vide", videoEntry)))
    cat(ftyp, moov)
  }

  private def wavFixture(): Array[Byte] = {
    val fmt = cat(cc("fmt "), le32(16), le16(1), le16(2), le32(16000),
      le32(64000), le16(4), le16(16))
    val data = cat(cc("data"), le32(128000)) // declared size, body absent
    cat(cc("RIFF"), le32(4 + fmt.length + data.length), cc("WAVE"), fmt, data)
  }

  private def aviFixture(): Array[Byte] = {
    val avih = cat(cc("avih"), le32(56), le32(40000), le32(0), le32(0),
      le32(0), le32(250), le32(0), le32(1), le32(0), le32(320), le32(240),
      Array.fill[Byte](16)(0))
    val strh = cat(cc("strh"), le32(48), cc("vids"), cc("MJPG"),
      Array.fill[Byte](40)(0))
    val strl = cat(cc("LIST"), le32(4L + strh.length), cc("strl"), strh)
    val hdrl = cat(cc("LIST"), le32(4L + avih.length + strl.length),
      cc("hdrl"), avih, strl)
    cat(cc("RIFF"), le32(4L + hdrl.length), cc("AVI "), hdrl)
  }

  /** EBML element: full-byte id + 1-byte VINT size (fixture bodies are
    * all well under the 1-byte limit of 127). */
  private def ebml(id: Array[Byte], body: Array[Byte]): Array[Byte] = {
    require(body.length < 127)
    cat(id, Array[Byte]((0x80 | body.length).toByte), body)
  }

  /** webm: EBML header (DocType webm) + Segment(Info(scale 1 ms,
    * duration 2500.0 ticks float), Tracks(video V_VP9 640x360,
    * audio A_OPUS 48 kHz 2ch)). */
  private def webmFixture(): Array[Byte] = {
    val hdr = ebml(Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte),
      ebml(Array[Byte](0x42, 0x82.toByte), cc("webm")))
    val info = ebml(Array[Byte](0x15, 0x49, 0xa9.toByte, 0x66),
      cat(ebml(Array[Byte](0x2a, 0xd7.toByte, 0xb1.toByte),
          be32(1000000)),                     // TimecodeScale 1 ms
        ebml(Array[Byte](0x44, 0x89.toByte),
          be32(java.lang.Float.floatToIntBits(2500f))))) // Duration
    val vid = ebml(Array[Byte](0xae.toByte), cat(
      ebml(Array[Byte](0x86.toByte), cc("V_VP9")),
      ebml(Array[Byte](0xe0.toByte), cat(
        ebml(Array[Byte](0xb0.toByte), be16(640)),
        ebml(Array[Byte](0xba.toByte), be16(360))))))
    val aud = ebml(Array[Byte](0xae.toByte), cat(
      ebml(Array[Byte](0x86.toByte), cc("A_OPUS")),
      ebml(Array[Byte](0xe1.toByte), cat(
        ebml(Array[Byte](0xb5.toByte),
          be32(java.lang.Float.floatToIntBits(48000f))),
        ebml(Array[Byte](0x9f.toByte), Array[Byte](2))))))
    val tracks = ebml(Array[Byte](0x16, 0x54, 0xae.toByte, 0x6b), cat(vid, aud))
    // Segment with UNKNOWN size (all value bits set) — the live-capture
    // layout the walker must extend to end-of-input
    cat(hdr, Array[Byte](0x18, 0x53, 0x80.toByte, 0x67, 0xff.toByte),
      info, tracks)
  }

  private def flacFixture(): Array[Byte] = {
    val si = new Array[Byte](34)
    si(10) = (22050 >> 12).toByte            // rate 20 bits
    si(11) = ((22050 >> 4) & 0xff).toByte
    si(12) = (((22050 & 0xf) << 4) | (0 << 1)).toByte // chan-1 = 0 → mono
    si(13) = 0                               // total samples 36 bits
    System.arraycopy(be32(44100), 0, si, 14, 4)
    cat(cc("fLaC"), Array[Byte](0x80.toByte, 0, 0, 34), si)
  }

  private def gifFixture(frames: Int, delayCs: Int): Array[Byte] = {
    val hdr = cat(cc("GIF89a"), le16(11), le16(7), Array[Byte](0, 0, 0))
    val one = cat(
      Array[Byte](0x21, 0xf9.toByte, 4, 0), le16(delayCs), Array[Byte](0, 0),
      Array[Byte](0x2c), le16(0), le16(0), le16(11), le16(7), Array[Byte](0),
      Array[Byte](2, 2, 1, 2, 0)) // lzw-min=2, one 2-byte sub-block, term
    cat((hdr +: Seq.fill(frames)(one)) :+ Array[Byte](0x3b): _*)
  }

  // ------------------------------------------------------------ mp3

  test("mp3: CBR stream walks every frame; exact duration and rate") {
    val n = 10
    val info = MediaProbe.probe(mp3Stream(n)).get
    assert(info.container == "mpeg-audio" && info.codec == "mp3")
    assert(info.sampleRate == 44100 && info.channels == 2)
    assert(info.frames == n)
    // 10 frames * 1152 samples / 44100 Hz = 261.2 ms, floored
    assert(info.durationMs == n * 1152L * 1000 / 44100)
    // walked-bytes average: 4170 B * 8 / 261 ms = 127 kbps (floored)
    assert(info.bitrateKbps == 4170L * 8 / info.durationMs)
  }

  /** First frame carrying a VBR header tag at the MPEG-1-stereo
    * offset (4-byte header + 32-byte side info = 36): Xing/Info with
    * the given flags/fields, or VBRI at the same fixed +36. */
  private def tagFrame(tag: String, fields: Array[Byte]): Array[Byte] = {
    val f = mp3Frame(0x00)
    val t = cat(cc(tag), fields)
    System.arraycopy(t, 0, f, 36, t.length)
    f
  }

  test("mp3: Xing totals give the exact VBR duration from a prefix") {
    // declared 100 frames / 41700 bytes, but only 2 audio frames are
    // in the probe window — the declared totals must win (the crawl
    // prefix-fetch case; VERDICT r10 task 6)
    val s = cat(tagFrame("Xing", cat(be32(3), be32(100), be32(41700))),
      mp3Stream(2))
    val info = MediaProbe.probe(s).get
    assert(info.codec == "mp3" && info.frames == 100)
    assert(info.durationMs == 100L * 1152 * 1000 / 44100)
    assert(info.bitrateKbps == 41700L * 8 / info.durationMs)
  }

  test("mp3: Info (CBR) header frame is metadata, not audio") {
    // frames-only flags; declared count equals the walked audio count,
    // and the tag frame itself must not inflate either the frame count
    // or the walked-bytes bitrate
    val s = cat(tagFrame("Info", cat(be32(1), be32(3))), mp3Stream(3))
    val info = MediaProbe.probe(s).get
    assert(info.frames == 3)
    assert(info.durationMs == 3L * 1152 * 1000 / 44100)
    // no bytes field -> walked bytes of the 3 AUDIO frames only
    assert(info.bitrateKbps == 3L * 417 * 8 / info.durationMs)
  }

  test("mp3: VBRI totals at the fixed +36 offset") {
    // "VBRI" ver(2) delay(2) quality(2) bytes(4) frames(4)
    val s = cat(tagFrame("VBRI",
        cat(be16(1), be16(0), be16(0), be32(20850), be32(50))),
      mp3Stream(2))
    val info = MediaProbe.probe(s).get
    assert(info.frames == 50)
    assert(info.durationMs == 50L * 1152 * 1000 / 44100)
    assert(info.bitrateKbps == 20850L * 8 / info.durationMs)
  }

  test("mp3: a Xing tag with no frames field falls back to the walk") {
    val s = cat(tagFrame("Xing", be32(0)), mp3Stream(2))
    val info = MediaProbe.probe(s).get
    assert(info.frames == 2, "header frame excluded, 2 audio frames walked")
    assert(info.durationMs == 2L * 1152 * 1000 / 44100)
  }

  test("mp3: a lying Xing frame total inconsistent with its own byte " +
      "total falls back to the walk") {
    // frames=0xFFFFFFFF over 41700 declared bytes is physically
    // impossible (every frame occupies >= 24 bytes) — the declared
    // count must be DISTRUSTED, not turned into a 3.5-year durationMs
    // (ADVICE r11: tags are hostile input)
    val s = cat(tagFrame("Xing",
        cat(be32(3), be32(0xFFFFFFFFL), be32(41700))),
      mp3Stream(2))
    val info = MediaProbe.probe(s).get
    assert(info.frames == 2, "implausible tag -> walked audio frames")
    assert(info.durationMs == 2L * 1152 * 1000 / 44100)
  }

  test("mp3: a lying frames-only Xing tag is duration-clamped") {
    // no byte total to cross-check against, so the declared count is
    // taken — but durationMs must stay inside the clamp (the longest
    // stream a 32-bit byte counter could describe, 0xFFFFFFFF ms),
    // never frames × 26 ms ≈ 3.5 years
    val s = cat(tagFrame("Xing", cat(be32(1), be32(0xFFFFFFFFL))),
      mp3Stream(2))
    val info = MediaProbe.probe(s).get
    assert(info.frames == 0xFFFFFFFFL)
    assert(info.durationMs == 0xFFFFFFFFL,
      s"hostile duration must clamp: ${info.durationMs}")
  }

  test("mp3: ID3v2 prefix is skipped by synchsafe length") {
    val tag = cat(cc("ID3"), Array[Byte](4, 0, 0),
      Array[Byte](0, 0, 1, 5), Array.fill[Byte](133)(0x41)) // size 0b1_0000101=133
    val info = MediaProbe.probe(cat(tag, mp3Stream(3))).get
    assert(info.codec == "mp3" && info.frames == 3)
  }

  test("mp3: a lone 0xFFEx in arbitrary binary is NOT declared mp3") {
    // one plausible header followed by non-frame garbage: the
    // two-consecutive-headers rule must reject it
    val junk = cat(mp3Frame().take(4), Array.fill[Byte](400)(0x41))
    assert(MediaProbe.probe(junk).isEmpty)
  }

  test("mp3: frame walk stops at a version/layer discontinuity") {
    // 3 good frames then garbage: frames counted = 3, not more
    val s = cat(mp3Stream(3), Array.fill[Byte](500)(0x13))
    assert(MediaProbe.probe(s).get.frames == 3)
  }

  test("mpeg audio: EXHAUSTIVE header space round-trips (756 combos)") {
    // Bitrate/samplerate tables retyped here from the ISO 11172-3 /
    // 13818-3 header annex — deliberately NOT shared with MediaProbe,
    // so a transcription slip in either copy breaks the round-trip.
    val brV1 = Map(
      1 -> Seq(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      2 -> Seq(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      3 -> Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
    val brV2 = Map(
      1 -> Seq(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      2 -> Seq(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      3 -> Seq(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
    val srByVer = Map( // version FIELD value -> rates by srIdx
      3 -> Seq(44100, 48000, 32000), 2 -> Seq(22050, 24000, 16000),
      0 -> Seq(11025, 12000, 8000))
    val codecName = Map(1 -> "mp1", 2 -> "mp2", 3 -> "mp3")
    var combos = 0
    for (ver <- Seq(3, 2, 0); layer <- 1 to 3; brIdx <- 1 to 14;
         srIdx <- 0 to 2; pad <- 0 to 1) {
      val br = (if (ver == 3) brV1 else brV2)(layer)(brIdx - 1)
      val sr = srByVer(ver)(srIdx)
      val spf = layer match {
        case 1 => 384
        case 2 => 1152
        case 3 => if (ver == 3) 1152 else 576
      }
      val len = layer match {
        case 1 => (12 * br * 1000 / sr + pad) * 4
        case 2 => 144 * br * 1000 / sr + pad
        case 3 => (if (ver == 3) 144 else 72) * br * 1000 / sr + pad
      }
      val frame = Array.fill[Byte](len)(0x5a)
      frame(0) = 0xff.toByte
      frame(1) = (0xe0 | (ver << 3) | ((4 - layer) << 1) | 1).toByte
      frame(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
      frame(3) = 0x00 // stereo
      val stream = cat(frame, frame, frame)
      val info = MediaProbe.probe(stream)
        .getOrElse(fail(s"no probe for ver=$ver layer=$layer br=$br " +
          s"sr=$sr pad=$pad len=$len"))
      assert(info.codec == codecName(layer) && info.sampleRate == sr &&
        info.frames == 3 && info.channels == 2 &&
        info.durationMs == 3L * spf * 1000 / sr,
        s"ver=$ver layer=$layer br=$br sr=$sr pad=$pad -> $info")
      combos += 1
    }
    assert(combos == 756)
  }

  test("mp3: ID3v2 footer flag adds 10 bytes to the skip") {
    val body = Array.fill[Byte](20)(0x41)
    val tag = cat(cc("ID3"), Array[Byte](4, 0, 0x10.toByte),
      Array[Byte](0, 0, 0, 20), body, Array.fill[Byte](10)(0x42)) // footer
    val info = MediaProbe.probe(cat(tag, mp3Stream(3))).get
    assert(info.codec == "mp3" && info.frames == 3)
  }

  // ----------------------------------------------------------- adts

  /** One ADTS frame: profile (0=Main 1=LC 2=SSR 3=LTP), srIdx into the
    * ISO table, channel config, payload bytes, optional CRC header,
    * `blocks` raw data blocks (1024 samples each). Field packing is
    * the spec's bit layout, built independently of the probe. */
  private def adtsFrame(payload: Int, profile: Int = 1, srIdx: Int = 4,
      cfg: Int = 2, crc: Boolean = false, blocks: Int = 1): Array[Byte] = {
    val hdrLen = if (crc) 9 else 7
    val len = hdrLen + payload
    cat(Array[Byte](
      0xff.toByte, (0xf0 | (if (crc) 0 else 1)).toByte,
      ((profile << 6) | (srIdx << 2) | ((cfg >> 2) & 1)).toByte,
      (((cfg & 3) << 6) | ((len >> 11) & 3)).toByte,
      ((len >> 3) & 0xff).toByte,
      (((len & 7) << 5) | 0x1f).toByte,
      (0xfc | (blocks - 1)).toByte),
      Array.fill[Byte](hdrLen - 7)(0), // CRC bytes when present
      Array.fill[Byte](payload)(0x41))
  }

  test("adts: frame walk gives exact sample-count duration and rate") {
    val s = cat((0 until 5).map(_ => adtsFrame(300)): _*)
    val info = MediaProbe.probe(s).get
    assert(info.container == "adts" && info.codec == "aac-lc")
    assert(info.sampleRate == 44100 && info.channels == 2)
    assert(info.frames == 5)
    assert(info.durationMs == 5 * 1024L * 1000 / 44100)
    assert(info.bitrateKbps == 5 * 307L * 8 / info.durationMs)
  }

  test("adts: CRC headers, multi-block frames, and profile names") {
    val crcStream = cat((0 until 4).map(_ =>
      adtsFrame(100, profile = 0, srIdx = 3, crc = true)): _*)
    val c = MediaProbe.probe(crcStream).get
    assert(c.codec == "aac-main" && c.sampleRate == 48000 && c.frames == 4)
    // two raw data blocks per frame double the samples per frame
    val two = cat((0 until 3).map(_ =>
      adtsFrame(100, srIdx = 8, cfg = 1, blocks = 2)): _*)
    val t = MediaProbe.probe(two).get
    assert(t.sampleRate == 16000 && t.channels == 1 &&
      t.durationMs == 3 * 2048L * 1000 / 16000)
    // channel config 7 is the 8-channel (7.1) layout
    assert(MediaProbe.probe(cat(adtsFrame(50, cfg = 7),
      adtsFrame(50, cfg = 7))).get.channels == 8)
  }

  test("adts: a lone sync is NOT declared aac; reserved srIdx rejects") {
    // one plausible header then garbage — two-consecutive rule rejects
    val junk = cat(adtsFrame(300).take(7), Array.fill[Byte](400)(0x41))
    assert(MediaProbe.probe(junk).isEmpty)
    // srIdx 13/14 reserved, 15 escape-forbidden in ADTS
    assert(MediaProbe.probe(cat(adtsFrame(50, srIdx = 13),
      adtsFrame(50, srIdx = 13))).isEmpty)
    // a single frame exactly filling the input IS acceptable
    assert(MediaProbe.probe(adtsFrame(120)).get.frames == 1)
  }

  test("adts: lying frame length cannot stall or crash the walk") {
    // declared length below the header size: that header is rejected
    // outright (a zero advance would loop forever) and the scan
    // resyncs onto the next real frame
    val f = adtsFrame(100)
    val zeroLen = f.clone()
    zeroLen(3) = (zeroLen(3) & 0xc0).toByte; zeroLen(4) = 0; zeroLen(5) = 0x1f
    assert(MediaProbe.probe(cat(zeroLen, adtsFrame(100))).get.frames == 1)
    // length overshooting the remaining buffer (truncated final frame):
    // walk stops at the last complete frame
    val over = cat(adtsFrame(100), adtsFrame(100), adtsFrame(4000).take(500))
    assert(MediaProbe.probe(over).get.frames == 2)
  }

  test("adts: an mp3 with junk before its sync is NOT stolen by " +
      "ADTS-shaped false syncs inside the mp3 payload") {
    // probeMp3 tolerates junk before its first sync via a window scan,
    // but probeAdts runs FIRST — so its defer check must mirror that
    // window, not only the post-ID3 offset. Here the mp3 stream starts
    // at offset 100 (after sync-free junk) and frame 0's compressed
    // payload happens to contain two consecutive ADTS-shaped headers:
    // a start-offset-only defer check never sees the mp3 (offset 100
    // != 0), accepts the embedded false pair, and misclassifies the
    // whole clip as aac.
    val m0 = mp3Frame(0x55)
    val falseAdts = cat(adtsFrame(20), adtsFrame(20))
    System.arraycopy(falseAdts, 0, m0, 50, falseAdts.length)
    val clip = cat(Array.fill[Byte](100)(0x41),
      m0, mp3Frame(0x11), mp3Frame(0x22))
    val info = MediaProbe.probe(clip).get
    assert(info.container == "mpeg-audio" && info.codec == "mp3",
      s"ADTS false syncs stole a windowed mp3: ${info.container}")
    assert(info.frames == 3)
  }

  test("adts: EXHAUSTIVE header space round-trips (2912 combos)") {
    // every profile × sampling index × channel config × CRC flag ×
    // raw-data-block count: build two consecutive frames from the
    // spec bit layout (the independent builder above) and require the
    // probe to read back every field exactly — the same all-corners
    // discipline as the MPEG-audio header test
    val srTab = Array(96000, 88200, 64000, 48000, 44100, 32000,
      24000, 22050, 16000, 12000, 11025, 8000, 7350)
    val profTab = Array("aac-main", "aac-lc", "aac-ssr", "aac-ltp")
    var combos = 0
    for (profile <- 0 to 3; srIdx <- 0 to 12; cfg <- 1 to 7;
         crc <- Seq(false, true); blocks <- 1 to 4) {
      val f = adtsFrame(40, profile, srIdx, cfg, crc, blocks)
      val info = MediaProbe.probe(cat(f, f)).getOrElse(
        fail(s"unprobed: p=$profile sr=$srIdx cfg=$cfg crc=$crc b=$blocks"))
      assert(info.container == "adts" && info.codec == profTab(profile))
      assert(info.sampleRate == srTab(srIdx))
      assert(info.channels == (if (cfg == 7) 8 else cfg))
      assert(info.frames == 2)
      assert(info.durationMs == 2L * blocks * 1024 * 1000 / srTab(srIdx))
      combos += 1
    }
    assert(combos == 4 * 13 * 7 * 2 * 4)
    // the reserved sampling indices reject across the whole space
    for (srIdx <- 13 to 15) {
      val f = adtsFrame(40, 1, srIdx, 2)
      assert(MediaProbe.probe(cat(f, f)).isEmpty, s"srIdx $srIdx accepted")
    }
  }

  test("adts: a real mp3 with ADTS-shaped bytes in its payload is " +
      "still mpeg-audio (the scanner-order ambiguity)") {
    // plant two consecutive valid ADTS frames INSIDE an mp3 frame's
    // payload: probeAdts runs first and its 64 KB window scan would
    // find them, but a verified MPEG-audio stream starts at offset 0,
    // so it must defer to probeMp3
    val fake = cat(adtsFrame(60), adtsFrame(60))
    val s = mp3Stream(3)
    System.arraycopy(fake, 0, s, 40, fake.length) // inside frame 1 payload
    val info = MediaProbe.probe(s).get
    assert(info.container == "mpeg-audio" && info.codec == "mp3",
      s"misclassified as ${info.container}/${info.codec}")
  }

  test("adts: ID3v2 prefix is skipped; walk stops at a rate change") {
    val tag = cat(cc("ID3"), Array[Byte](4, 0, 0),
      Array[Byte](0, 0, 0, 30), Array.fill[Byte](30)(0x41))
    val info = MediaProbe.probe(cat(tag, adtsFrame(80), adtsFrame(80))).get
    assert(info.codec == "aac-lc" && info.frames == 2)
    // a samplerate discontinuity ends the stream, frames don't mix
    val mixed = cat(adtsFrame(80), adtsFrame(80), adtsFrame(80, srIdx = 7))
    assert(MediaProbe.probe(mixed).get.frames == 2)
  }

  // ------------------------------------------------------------ mp4

  test("mp4: box walk finds mvhd duration, tkhd dims, stsd codec, stsz") {
    val info = MediaProbe.probe(mp4Fixture()).get
    assert(info.container == "isom" && info.codec == "avc1")
    assert(info.durationMs == 5000) // 5000 ticks at timescale 1000
    assert(info.width == 640 && info.height == 360)
    assert(info.frames == 150)
  }

  test("mp4 sample tables: mdhd/stts/stsc/stsz give exact duration, " +
      "fps, byte totals and chunk count; truncated tables stay bounded") {
    // 30 samples: 29 at Δ100 + 1 at Δ100 (media timescale 600 →
    // trackDur = 3000/600·1000 = 5000 ms, fps = 30·600·1000/3000 =
    // 6000 mHz); chunks: run (1, spc 4) then (3, spc 8) → 2·4 = 8
    // covered, ceil(22/8) = 3 → 5 chunks; sizes 10,20,...,300 →
    // Σ = 4650, max 300
    def fix(stts: Array[Byte], stsc: Array[Byte],
        stsz: Array[Byte]): Array[Byte] = {
      val ftyp = box("ftyp", cat(cc("isom"), be32(0), cc("isom")))
      val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
        be32(1000), be32(5000), Array.fill[Byte](80)(0)))
      val mdhd = box("mdhd", cat(be32(0), be32(0), be32(0),
        be32(600), be32(3000), be32(0)))
      val stsd = box("stsd", cat(be32(0), be32(1),
        cat(be32(86), cc("avc1"), Array.fill[Byte](78)(0))))
      val hdlr = box("hdlr", cat(be32(0), be32(0), cc("vide"),
        Array.fill[Byte](13)(0)))
      val stbl = box("stbl", cat(stsd, stts, stsc, stsz))
      val trak = box("trak", box("mdia", cat(mdhd, hdlr,
        box("minf", stbl))))
      cat(ftyp, box("moov", cat(mvhd, trak)))
    }
    val stts = box("stts", cat(be32(0), be32(2),
      be32(29), be32(100), be32(1), be32(100)))
    val stsc = box("stsc", cat(be32(0), be32(2),
      be32(1), be32(4), be32(0), be32(3), be32(8), be32(0)))
    val stsz = box("stsz", cat(be32(0), be32(0), be32(30),
      cat(Seq.tabulate(30)(i => be32((i + 1) * 10L)): _*)))
    val info = MediaProbe.probe(fix(stts, stsc, stsz)).get
    assert(info.trackDurMs == 5000, s"trackDurMs ${info.trackDurMs}")
    assert(info.fpsMilli == 6000, s"fpsMilli ${info.fpsMilli}")
    assert(info.sampleBytes == 4650 && info.maxSampleBytes == 300)
    assert(info.chunks == 5, s"chunks ${info.chunks}")
    assert(info.frames == 30)
    // constant-size stsz: totals multiply instead of walking a table
    val cstsz = box("stsz", cat(be32(0), be32(777), be32(30)))
    val cinfo = MediaProbe.probe(fix(stts, stsc, cstsz)).get
    assert(cinfo.sampleBytes == 30L * 777 && cinfo.maxSampleBytes == 777)
    // truncation fuzz: stts DECLARES 100 entries but carries one — the
    // sums must cover only the real entry, never sibling bytes; an
    // stsz whose declared count overruns its box stays box-bounded
    val liarStts = box("stts", cat(be32(0), be32(100),
      be32(29), be32(100)))
    val tinfo = MediaProbe.probe(fix(liarStts, stsc, stsz)).get
    assert(tinfo.trackDurMs == 29L * 100 * 1000 / 600,
      s"truncated stts leaked: ${tinfo.trackDurMs}")
    val liarStsz = box("stsz", cat(be32(0), be32(0), be32(1000000),
      cat(Seq.tabulate(3)(i => be32((i + 1) * 10L)): _*)))
    val zinfo = MediaProbe.probe(fix(stts, stsc, liarStsz)).get
    assert(zinfo.sampleBytes == 60 && zinfo.maxSampleBytes == 30,
      s"overrunning stsz leaked: ${zinfo.sampleBytes}")
    // overflow fuzz: u32·u32 products past Long.MaxValue must saturate
    // to 0 ("unknown"), never surface as wrapped negatives — a
    // constant-size stsz of 0xFFFFFFFF × 0xFFFFFFFF and an stts run of
    // the same magnitudes are both structurally legal byte layouts
    val hugeStsz = box("stsz", cat(be32(0),
      be32(0xffffffffL), be32(0xffffffffL)))
    val oinfo = MediaProbe.probe(fix(stts, stsc, hugeStsz)).get
    assert(oinfo.sampleBytes == 0 && oinfo.maxSampleBytes == 0,
      s"stsz overflow leaked: ${oinfo.sampleBytes}")
    val hugeStts = box("stts", cat(be32(0), be32(2),
      be32(0xffffffffL), be32(0xffffffffL),
      be32(0xffffffffL), be32(0xffffffffL)))
    val tinfo2 = MediaProbe.probe(fix(hugeStts, stsc, stsz)).get
    assert(tinfo2.trackDurMs == 0 && tinfo2.fpsMilli == 0,
      s"stts overflow leaked: ${tinfo2.trackDurMs}/${tinfo2.fpsMilli}")
    assert(tinfo2.sampleBytes >= 0 && tinfo2.chunks >= 0)
  }

  test("mp4 stss: sync-sample count when present; all-sync fallback " +
      "when absent; lying entry_count stays box-bounded") {
    def fix(extra: Array[Byte]*): Array[Byte] = {
      val ftyp = box("ftyp", cat(cc("isom"), be32(0), cc("isom")))
      val stsd = box("stsd", cat(be32(0), be32(1),
        cat(be32(86), cc("avc1"), Array.fill[Byte](78)(0))))
      val hdlr = box("hdlr", cat(be32(0), be32(0), cc("vide"),
        Array.fill[Byte](13)(0)))
      val stsz = box("stsz", cat(be32(0), be32(0), be32(48),
        cat(Seq.tabulate(48)(_ => be32(100L)): _*)))
      val stbl = box("stbl", cat(stsd +: stsz +: extra: _*))
      cat(ftyp, box("moov", box("trak",
        box("mdia", cat(hdlr, box("minf", stbl))))))
    }
    // present: 2 keyframes out of 48 samples (GOP length 24)
    val stss = box("stss", cat(be32(0), be32(2), be32(1), be32(25)))
    val p = MediaProbe.probe(fix(stss)).get
    assert(p.syncSamples == 2, s"stss count ${p.syncSamples}")
    assert(p.frames == 48)
    // absent: EVERY sample is a sync sample (ISO 14496-12 §8.6.2) —
    // the all-intra / audio case reports the full sample count
    val a = MediaProbe.probe(fix()).get
    assert(a.syncSamples == 48, s"all-sync fallback ${a.syncSamples}")
    // a declared entry_count overrunning the box yields only the
    // entries physically present, never sibling bytes
    val liar = box("stss", cat(be32(0), be32(1000000), be32(1)))
    val l = MediaProbe.probe(fix(liar)).get
    assert(l.syncSamples == 1, s"lying stss leaked ${l.syncSamples}")
    // an EMPTY present table is 0 sync points, NOT the all-sync
    // fallback (a live/fragmented muxer artifact, kept distinct)
    val empty = box("stss", cat(be32(0), be32(0)))
    assert(MediaProbe.probe(fix(empty)).get.syncSamples == 0)
  }

  test("m4a: audio sample entry carries channels + 16.16 sample rate") {
    val info = MediaProbe.probe(m4aFixture()).get
    assert(info.container == "M4A" && info.codec == "mp4a")
    assert(info.channels == 2 && info.sampleRate == 44100)
    assert(info.durationMs == 10000) // 441000 ticks at timescale 44100
  }

  // ----------------------------------------------------- aiff / au

  private def ext80(rate: Long): Array[Byte] = {
    val lg = 63 - java.lang.Long.numberOfLeadingZeros(rate)
    val m = rate << (63 - lg)
    cat(be16(16383 + lg.toInt), be32(m >>> 32), be32(m & 0xffffffffL))
  }

  private def aiffFixture(form: String, commBody: Array[Byte],
      extra: Array[Byte] = Array.empty): Array[Byte] = {
    val comm = cat(cc("COMM"), be32(commBody.length), commBody)
    cat(cc("FORM"), be32(4L + comm.length + extra.length), cc(form),
      comm, extra)
  }

  test("aiff: COMM fields exact, 80-bit extended rate decoded by " +
      "integer arithmetic; AIFC fourcc routes the codec name") {
    val comm = cat(be16(2), be32(441000), be16(16), ext80(44100))
    val i = MediaProbe.probe(aiffFixture("AIFF", comm)).get
    assert(i.container == "aiff" && i.codec == "pcm_s16be")
    assert(i.sampleRate == 44100 && i.channels == 2)
    assert(i.durationMs == 10000 && i.frames == 441000)
    assert(i.bitrateKbps == 44100 * 2 * 16 / 1000)
    // AIFC + sowt = byte-swapped (little-endian) pcm
    val sowt = cat(comm, cc("sowt"), Array[Byte](0, 0))
    val c = MediaProbe.probe(aiffFixture("AIFC", sowt)).get
    assert(c.container == "aifc" && c.codec == "pcm_s16le")
    // AIFC + a G.711 fourcc surfaces as that codec
    val ul = cat(be16(1), be32(8000), be16(8), ext80(8000),
      cc("ulaw"), Array[Byte](0, 0))
    val u = MediaProbe.probe(aiffFixture("AIFC", ul)).get
    assert(u.codec == "ulaw" && u.durationMs == 1000)
  }

  test("aiff: 80-bit rate round-trips exactly across the realistic " +
      "and adversarial integer range") {
    // the fixture encoder normalizes any positive int into the
    // explicit-integer-bit extended layout; the probe must recover it
    // exactly — one bit of drift in the exponent arithmetic shifts
    // every duration on the corpus
    for (rate <- Seq(1L, 7L, 8000L, 11025L, 16000L, 22050L, 44100L,
        48000L, 96000L, 192000L, 1234567L, Int.MaxValue.toLong)) {
      val comm = cat(be16(1), be32(rate * 2), be16(16), ext80(rate))
      val i = MediaProbe.probe(aiffFixture("AIFF", comm)).get
      assert(i.sampleRate.toLong == rate,
        s"ext80 round-trip broke at $rate: got ${i.sampleRate}")
      assert(i.durationMs == 2000, s"duration at $rate: ${i.durationMs}")
    }
  }

  test("ogg: a signed -1 Vorbis bitrate_nominal is 'unset', not a " +
      "gigabit declared rate; a 1-byte first packet claims no codec") {
    def page(gran: Long, payload: Array[Byte], tail: Array[Byte] = Array.empty)
        : Array[Byte] =
      cat(cc("OggS"), Array[Byte](0, 2), le64(gran), le32(1), le32(0),
        le32(0), Array[Byte](1, payload.length.toByte), payload, tail)
    // id header with br_nom = 0xFFFFFFFF (the spec's signed unset):
    // must fall back to the bytes/duration estimate, never min-clamp
    // the unsigned read into ~1048576 kbps
    val head = cat(Array[Byte](0x01), cc("vorbis"), le32(0),
      Array[Byte](2), le32(44100), le32(0), le32(0xffffffffL),
      le32(0), Array[Byte](0xb8.toByte, 0x01))
    val v = MediaProbe.probe(cat(page(0, head),
      page(88200, Array.fill[Byte](20)(3)))).get
    assert(v.codec == "vorbis" && v.bitrateKbps < 1000,
      s"unset br_nom leaked: ${v.bitrateKbps}")
    // first packet = ONE byte (0x01), with "vorbis..." sitting in the
    // SECOND packet of the same page: the magic straddles the packet
    // boundary and must not identify
    val cut = MediaProbe.probe(cat(
      page(0, Array[Byte](0x01), cat(cc("vorbis"),
        Array.fill[Byte](24)(0))),
      page(88200, Array.fill[Byte](20)(3))))
    assert(cut.isEmpty, s"cross-packet magic claimed a codec: $cut")
  }

  test("aiff: lying sizes and hostile COMMs degrade, never throw") {
    // negative-rate 80-bit float (sign bit set) clamps to unknown
    val neg = cat(be16(2), be32(1000), be16(16),
      cat(Array[Byte](0xC0.toByte, 0x0E), be32(0xAC440000L), be32(0)))
    val n = MediaProbe.probe(aiffFixture("AIFF", neg)).get
    assert(n.sampleRate == 0 && n.durationMs == 0)
    // a COMM whose declared size overruns the buffer is skipped (no
    // COMM parsed -> no codec -> None, not a crash)
    val cut = cat(cc("FORM"), be32(100), cc("AIFF"),
      cc("COMM"), be32(18), be16(2))
    assert(MediaProbe.probe(cut).isEmpty)
    // a lying FORM size smaller than the real chunks caps the walk
    val comm = cat(be16(2), be32(441000), be16(16), ext80(44100))
    val full = aiffFixture("AIFF", comm)
    val lied = full.clone()
    lied(7) = 2 // FORM size 2: walk ends before COMM
    assert(MediaProbe.probe(lied).isEmpty)
    // hostile COMM fields: 0 channels / 0-bit samples mint no codec
    assert(MediaProbe.probe(aiffFixture("AIFF",
      cat(be16(0), be32(1000), be16(16), ext80(44100)))).isEmpty)
    assert(MediaProbe.probe(aiffFixture("AIFF",
      cat(be16(2), be32(1000), be16(0), ext80(44100)))).isEmpty)
    // u32 frames over a 1 Hz rate: duration clamps (probeMp3's
    // hostile-tag convention), never a ~136-year figure
    val huge = MediaProbe.probe(aiffFixture("AIFF",
      cat(be16(1), be32(0xffffffffL), be16(16), ext80(1)))).get
    assert(huge.durationMs == 0xffffffffL,
      s"hostile duration unclamped: ${huge.durationMs}")
  }

  test("aiff/au really decode through the existing javax.sound path " +
      "(the probe's routing claim, exercised)") {
    // AIFF: 8 mono s16be samples of +0x4000 (= +0.5 full scale)
    val pcm = Array.tabulate[Byte](16)(
      i => if (i % 2 == 0) 0x40 else 0x00)
    val comm = cat(be16(1), be32(8), be16(16), ext80(8000))
    val clip = aiffFixture("AIFF",
      comm, cat(cc("SSND"), be32(8L + 16), be32(0), be32(0), pcm))
    val (rate, mono) = AudioOps.decodeWav(clip).get
    assert(rate == 8000f && mono.length == 8)
    assert(mono.forall(v => math.abs(v - 0.5) < 0.01),
      s"aiff s16be samples decoded wrong: ${mono.toSeq}")
    // AU: G.711 mu-law 0xFF encodes digital silence
    val auClip = cat(cc(".snd"), be32(24), be32(100), be32(1),
      be32(8000), be32(1), Array.fill[Byte](100)(0xff.toByte))
    val (auRate, auMono) = AudioOps.decodeWav(auClip).get
    assert(auRate == 8000f && auMono.length == 100)
    assert(auMono.forall(v => math.abs(v) < 0.001),
      s"mu-law silence decoded wrong: ${auMono.take(4).toSeq}")
  }

  test("au: header fields exact; EOF-size convention and overrunning " +
      "declared sizes clamp to the bytes present") {
    def au(size: Long, enc: Long, n: Int): Array[Byte] =
      cat(cc(".snd"), be32(24), be32(size), be32(enc), be32(8000),
        be32(1), Array.fill[Byte](n)(0x11))
    val i = MediaProbe.probe(au(4000, 1, 4000)).get
    assert(i.container == "au" && i.codec == "ulaw")
    assert(i.sampleRate == 8000 && i.channels == 1)
    assert(i.durationMs == 500 && i.frames == 4000 && i.bitrateKbps == 64)
    // 0xFFFFFFFF = "unknown, read to EOF" (the spec's convention)
    val eof = MediaProbe.probe(au(0xffffffffL, 1, 2000)).get
    assert(eof.durationMs == 250 && eof.frames == 2000)
    // declared size overrunning the buffer: clamp, never invent
    val over = MediaProbe.probe(au(1000000, 3, 1600)).get
    assert(over.codec == "pcm_s16be" && over.frames == 800 &&
      over.durationMs == 100)
    // unknown encodings are not claimed
    assert(MediaProbe.probe(au(100, 99, 100)).isEmpty)
    // a data offset BEYOND the buffer: the audio lives outside this
    // probe window — zero samples, never a duration computed from
    // annotation/junk bytes
    val far = cat(cc(".snd"), be32(0x7fffff00L), be32(4000), be32(1),
      be32(8000), be32(1), Array.fill[Byte](4000)(0x11))
    val f = MediaProbe.probe(far).get
    assert(f.frames == 0 && f.durationMs == 0,
      s"lying offset invented samples: $f")
  }

  // ------------------------------------------------------------ ogg

  test("ogg opus: codec from OpusHead, duration from last granule " +
      "MINUS the id header's pre-skip") {
    val info = MediaProbe.probe(oggOpusFixture(96000)).get
    assert(info.container == "ogg" && info.codec == "opus")
    assert(info.channels == 2 && info.sampleRate == 48000)
    // RFC 7845 §4.2: the granule INCLUDES the 312 pre-skip samples
    // the decoder drops — playback is (96000 - 312) / 48 kHz
    assert(info.durationMs == (96000 - 312) * 1000L / 48000)
    assert(info.frames == 1) // one packet completes on the audio page
  }

  test("ogg opus: pre-skip clamps and truncation degrades cleanly") {
    def page(gran: Long, payload: Array[Byte]): Array[Byte] =
      cat(cc("OggS"), Array[Byte](0, 2), le64(gran), le32(1), le32(0),
        le32(0), Array[Byte](1, payload.length.toByte), payload)
    // a lying pre-skip LARGER than the final granule must clamp the
    // duration to 0, never wrap negative
    val lying = cat(cc("OpusHead"), Array[Byte](1, 2), le16(60000),
      le32(48000), le16(0), Array[Byte](0))
    val l = MediaProbe.probe(cat(page(0, lying),
      page(48000, Array.fill[Byte](20)(3)))).get
    assert(l.codec == "opus" && l.durationMs == 0,
      s"lying pre-skip must clamp: ${l.durationMs}")
    // id packet truncated BEFORE the pre-skip field (magic + version
    // only): still identified as opus, channels unread, and the
    // duration falls back to the raw granule (pre-skip 0)
    val cut = cat(cc("OpusHead"), Array[Byte](1))
    val t = MediaProbe.probe(cat(page(0, cut),
      page(48000, Array.fill[Byte](20)(3)))).get
    assert(t.codec == "opus" && t.channels == 0)
    assert(t.durationMs == 1000, s"truncated-header fallback: ${t.durationMs}")
  }

  test("ogg: a window truncated INSIDE the segment table (trailing " +
      "0xFF lacing values) must not throw — r13 ADVICE") {
    // exactly 28 bytes: header through nseg0=2, ONE lacing byte 0xFF
    // present, the second missing. The lacing walk was bounded only by
    // nseg0 (u8 has no bounds check) → AIOOBE through the flatMap.
    val cut = cat(cc("OggS"), Array[Byte](0, 2), le64(0), le32(1),
      le32(0), le32(0), Array[Byte](2, -1))
    assert(cut.length == 28)
    assert(MediaProbe.probe(cut).forall(_.codec.nonEmpty),
      "truncated segment table must degrade, not throw")
    // the same shape with MANY trailing 0xFF values and a longer tail
    // that still ends inside the table
    val cut2 = cat(cc("OggS"), Array[Byte](0, -1), le64(0), le32(1),
      le32(0), le32(0), Array.fill[Byte](100)(-1))
    MediaProbe.probe(cut2) // must not throw
  }

  test("ogg: frames counts packets completing on audio pages only " +
      "(granule-0 header pages and continued-packet pages excluded)") {
    def page(gran: Long, lacing: Array[Byte],
        payload: Array[Byte]): Array[Byte] =
      cat(cc("OggS"), Array[Byte](0, 0), le64(gran), le32(1), le32(0),
        le32(0), Array[Byte](lacing.length.toByte), lacing, payload)
    val head = cat(cc("OpusHead"), Array[Byte](1, 2), le16(312),
      le32(48000), le16(0), Array[Byte](0))
    // header page (granule 0, 1 packet), tags page (granule 0, 1
    // packet — must NOT count), audio page A: 3 packets (lacing 20,
    // 20, 20), a continued-packet page (granule -1, one 255 lacing,
    // no completion), audio page B: the continuation ends + 1 more
    // (lacing 45, 20) => frames = 3 + 2 = 5
    val clip = cat(
      page(0, Array[Byte](head.length.toByte), head),
      page(0, Array[Byte](30), cat(cc("OpusTags"),
        Array.fill[Byte](22)(0x41))),
      page(4800, Array[Byte](20, 20, 20), Array.fill[Byte](60)(1)),
      page(-1, Array[Byte](-1), Array.fill[Byte](255)(2)), // 255 = cont.
      page(9600, Array[Byte](45, 20), Array.fill[Byte](65)(3)))
    val info = MediaProbe.probe(clip).get
    assert(info.frames == 5, s"packet count ${info.frames}")
    assert(info.durationMs == (9600 - 312) * 1000L / 48000)
  }

  test("ogg: a multiplexed second stream's packets don't inflate " +
      "frames; a chained stream ends both count and duration at " +
      "chain 1") {
    def page(typ: Byte, serial: Long, gran: Long, lacing: Array[Byte],
        payload: Array[Byte]): Array[Byte] =
      cat(cc("OggS"), Array[Byte](0, typ), le64(gran), le32(serial),
        le32(0), le32(0), Array[Byte](lacing.length.toByte), lacing,
        payload)
    val head = cat(cc("OpusHead"), Array[Byte](1, 2), le16(312),
      le32(48000), le16(0), Array[Byte](0))
    // grouped mux (RFC 3533 §4): BOS pages of BOTH streams first
    // (opus serial 1 identified from page one, a second stream serial
    // 9), then interleaved data pages — stream 9's completed packets
    // must not count toward the AUDIO frames
    val mux = cat(
      page(2, 1, 0, Array[Byte](head.length.toByte), head),
      page(2, 9, 0, Array[Byte](10), Array.fill[Byte](10)(7)),
      page(0, 1, 4800, Array[Byte](20, 20), Array.fill[Byte](40)(1)),
      page(0, 9, 777, Array[Byte](10, 10, 10), Array.fill[Byte](30)(7)),
      page(0, 1, 9600, Array[Byte](20), Array.fill[Byte](20)(1)))
    val m = MediaProbe.probe(mux).get
    assert(m.frames == 3, s"mux leaked foreign packets: ${m.frames}")
    assert(m.durationMs == (9600 - 312) * 1000L / 48000)
    // chained file (a radio-dump concat): granules RESET at chain 2,
    // so both frames AND duration must describe chain 1 — not chain
    // 1+2 packets against chain 2's (shorter) last granule
    val chain2 = cat(
      page(2, 5, 0, Array[Byte](head.length.toByte), head),
      page(0, 5, 4800, Array[Byte](20), Array.fill[Byte](20)(3)))
    val chain1 = cat(
      page(2, 1, 0, Array[Byte](head.length.toByte), head),
      page(0, 1, 4800, Array[Byte](20, 20), Array.fill[Byte](40)(1)),
      page(0, 1, 14400, Array[Byte](20), Array.fill[Byte](20)(1)))
    val c = MediaProbe.probe(cat(chain1, chain2)).get
    assert(c.frames == 3, s"chained count leaked: ${c.frames}")
    assert(c.durationMs == (14400 - 312) * 1000L / 48000,
      s"duration not chain 1's: ${c.durationMs}")
  }

  test("ogg vorbis: type byte + magic at packet start; channels/rate " +
      "from the id header; duration from last granule") {
    val info = MediaProbe.probe(oggVorbisFixture(88200)).get
    assert(info.container == "ogg" && info.codec == "vorbis")
    assert(info.channels == 2 && info.sampleRate == 44100)
    assert(info.durationMs == 2000) // 88200 PCM samples at 44.1 kHz
    // bitrate_nominal from the id header (128000 bps in the fixture),
    // not the bytes/duration guess
    assert(info.bitrateKbps == 128, s"declared rate: ${info.bitrateKbps}")
  }

  test("ogg flac: mapping packet recognized; rate/channels from the " +
      "embedded native STREAMINFO") {
    val info = MediaProbe.probe(oggFlacFixture(44100)).get
    assert(info.container == "ogg" && info.codec == "flac")
    assert(info.channels == 1 && info.sampleRate == 22050)
    assert(info.durationMs == 2000) // 44100 PCM samples at 22.05 kHz
  }

  test("mp4: hdlr routes a non-whitelisted audio entry (ec-3) to the " +
      "audio side; the video trak's avc1 stays the reported codec") {
    val info = MediaProbe.probe(mp4TwoTrakFixture()).get
    assert(info.codec == "avc1",
      s"video codec must win the codec field, got ${info.codec}")
    assert(info.channels == 6 && info.sampleRate == 48000,
      s"audio fields must come from the ec-3 entry, got $info")
  }

  /** trak with an explicit handler, stsd entry and stsz sample count —
    * for trak-order / non-AV-handler routing tests. */
  private def trakHSC(handler: String, entry: Array[Byte],
      samples: Long): Array[Byte] = {
    val stsd = box("stsd", cat(be32(0), be32(1), entry))
    val stsz = box("stsz", cat(be32(0), be32(0), be32(samples)))
    val stbl = box("stbl", cat(stsd, stsz))
    val minf = box("minf", stbl)
    val hdlr = box("hdlr", cat(be32(0), be32(0), cc(handler),
      Array.fill[Byte](13)(0)))
    box("trak", box("mdia", cat(hdlr, minf)))
  }

  test("mp4: a text/chapter trak (hdlr 'text', entry tx3g) listed " +
      "FIRST leaks into neither codec field nor the frame count") {
    val ftyp = box("ftyp", cat(cc("isom"), be32(512), cc("isom")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(1000), be32(5000), Array.fill[Byte](80)(0)))
    val textEntry = cat(be32(32), cc("tx3g"), Array.fill[Byte](24)(0))
    val videoEntry = cat(be32(86), cc("avc1"), Array.fill[Byte](78)(0))
    val moov = box("moov", cat(mvhd,
      trakHSC("text", textEntry, 99),
      trakHSC("vide", videoEntry, 150)))
    val info = MediaProbe.probe(cat(ftyp, moov)).get
    assert(info.codec == "avc1",
      s"tx3g must not masquerade as the stream codec, got ${info.codec}")
    assert(info.frames == 150,
      s"frames must come from the video trak, got ${info.frames}")
  }

  test("mp4: audio trak listed first — frames still reports the VIDEO " +
      "sample count, not the audio frame count") {
    val ftyp = box("ftyp", cat(cc("isom"), be32(512), cc("isom")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(1000), be32(5000), Array.fill[Byte](80)(0)))
    val audioEntry = cat(be32(36 + 8), cc("mp4a"), Array.fill[Byte](6)(0),
      be16(1), be16(0), be16(0), be32(0), be16(2), be16(16), be16(0),
      be16(0), be32(48000L << 16))
    val videoEntry = cat(be32(86), cc("avc1"), Array.fill[Byte](78)(0))
    val moov = box("moov", cat(mvhd,
      trakHSC("soun", audioEntry, 230000),
      trakHSC("vide", videoEntry, 120)))
    val info = MediaProbe.probe(cat(ftyp, moov)).get
    assert(info.frames == 120,
      s"audio sample count must not win frames, got ${info.frames}")
    assert(info.codec == "avc1" && info.channels == 2)
  }

  test("mp4: two audio traks — codec, channels, rate and frames all " +
      "come from the FIRST trak, never mixed across traks") {
    def audioE(fcc: String, chn: Int, rate: Int): Array[Byte] =
      cat(be32(36 + 8), cc(fcc), Array.fill[Byte](6)(0),
        be16(1), be16(0), be16(0), be32(0), be16(chn), be16(16), be16(0),
        be16(0), be32(rate.toLong << 16))
    val ftyp = box("ftyp", cat(cc("M4A "), be32(0), cc("M4A ")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(44100), be32(441000), Array.fill[Byte](80)(0)))
    val moov = box("moov", cat(mvhd,
      trakHSC("soun", audioE("mp4a", 2, 44100), 1000),
      trakHSC("soun", audioE("ac-3", 6, 48000), 500)))
    val info = MediaProbe.probe(cat(ftyp, moov)).get
    assert(info.codec == "mp4a" && info.channels == 2 &&
      info.sampleRate == 44100 && info.frames == 1000,
      s"fields mixed across audio traks: $info")
  }

  // trak with tkhd dims in addition to handler/stsd/stsz
  private def trakD(handler: String, entry: Array[Byte], samples: Long,
      tw: Int, th: Int): Array[Byte] = {
    val tkhd = box("tkhd", cat(be32(0), Array.fill[Byte](72)(0),
      be32(tw.toLong << 16), be32(th.toLong << 16)))
    val stsd = box("stsd", cat(be32(0), be32(1), entry))
    val stsz = box("stsz", cat(be32(0), be32(0), be32(samples)))
    val stbl = box("stbl", cat(stsd, stsz))
    val minf = box("minf", stbl)
    val hdlr = box("hdlr", cat(be32(0), be32(0), cc(handler),
      Array.fill[Byte](13)(0)))
    box("trak", cat(tkhd, box("mdia", cat(hdlr, minf))))
  }

  test("mp4: width/height come from the VIDEO trak, not whichever trak " +
      "was listed last (a chapter trak legally carries tkhd dims)") {
    val ftyp = box("ftyp", cat(cc("isom"), be32(512), cc("isom")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(1000), be32(5000), Array.fill[Byte](80)(0)))
    val textEntry = cat(be32(32), cc("tx3g"), Array.fill[Byte](24)(0))
    val videoEntry = cat(be32(86), cc("avc1"), Array.fill[Byte](78)(0))
    // video trak FIRST, chapter trak (with its own dims) after: the
    // later trak's dims must not overwrite the video trak's
    val a = MediaProbe.probe(cat(ftyp, box("moov", cat(mvhd,
      trakD("vide", videoEntry, 150, 1920, 1080),
      trakD("text", textEntry, 99, 640, 480))))).get
    assert(a.width == 1920 && a.height == 1080,
      s"later trak's tkhd dims overwrote the video trak's: $a")
    // chapter trak FIRST: handler routing (not document order) decides
    val b = MediaProbe.probe(cat(ftyp, box("moov", cat(mvhd,
      trakD("text", textEntry, 99, 640, 480),
      trakD("vide", videoEntry, 150, 1920, 1080))))).get
    assert(b.width == 1920 && b.height == 1080,
      s"non-video trak's dims won over the video trak's: $b")
    assert(a.codec == "avc1" && b.codec == "avc1")
  }

  test("mp4: handlerless trak dims survive as the fallback when no " +
      "vide trak provides any") {
    val ftyp = box("ftyp", cat(cc("isom"), be32(512), cc("isom")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(1000), be32(5000), Array.fill[Byte](80)(0)))
    val videoEntry = cat(be32(86), cc("avc1"), Array.fill[Byte](78)(0))
    val tkhd = box("tkhd", cat(be32(0), Array.fill[Byte](72)(0),
      be32(640L << 16), be32(360L << 16)))
    val stsd = box("stsd", cat(be32(0), be32(1), videoEntry))
    val trak = box("trak", cat(tkhd,
      box("mdia", box("minf", box("stbl", stsd))))) // NO hdlr anywhere
    val info = MediaProbe.probe(cat(ftyp, box("moov", cat(mvhd, trak)))).get
    assert(info.width == 640 && info.height == 360,
      s"no-hdlr fallback dims lost: $info")
  }

  test("mp4: hdlr-absent fallback routes an 'Opus' entry (registered " +
      "capitalization) to the audio fields, not the video codec") {
    val ftyp = box("ftyp", cat(cc("M4A "), be32(0), cc("M4A ")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(48000), be32(480000), Array.fill[Byte](80)(0)))
    val entry = cat(be32(36 + 8), cc("Opus"), Array.fill[Byte](6)(0),
      be16(1), be16(0), be16(0), be32(0), be16(2), be16(16), be16(0),
      be16(0), be32(48000L << 16))
    val stsd = box("stsd", cat(be32(0), be32(1), entry))
    val trak = box("trak",
      box("mdia", box("minf", box("stbl", stsd)))) // hdlr ABSENT
    val info = MediaProbe.probe(cat(ftyp, box("moov", cat(mvhd, trak)))).get
    assert(info.codec == "Opus" && info.channels == 2 &&
      info.sampleRate == 48000,
      s"Opus must route through audioEntry() in the no-hdlr fallback: $info")
  }

  test("mp4: truncated stsz / hdlr boxes read nothing from sibling " +
      "bytes (walk-level own-end bounding)") {
    // stsz declares size 16 (header + 8 body bytes): the sample_count
    // position lands on the next sibling's size field, which must not
    // be reported as the frame count. Likewise a truncated hdlr must
    // not set the handler from sibling bytes (which would disable the
    // no-hdlr fourcc fallback).
    val ftyp = box("ftyp", cat(cc("isom"), be32(512), cc("isom")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(1000), be32(5000), Array.fill[Byte](80)(0)))
    val stsdEntry = cat(be32(86), cc("avc1"), Array.fill[Byte](78)(0))
    val stsd = box("stsd", cat(be32(0), be32(1), stsdEntry))
    val shortStsz = box("stsz", cat(be32(0), be32(0)))   // no count field
    val shortHdlr = box("hdlr", cat(be32(0), be32(0)))   // no handler field
    val stbl = box("stbl", cat(stsd, shortStsz))
    val trak = box("trak", box("mdia", cat(shortHdlr,
      box("minf", stbl))))
    val moov = box("moov", cat(mvhd, trak))
    val info = MediaProbe.probe(cat(ftyp, moov)).get
    assert(info.frames == 0,
      s"truncated stsz leaked sibling bytes as frames: ${info.frames}")
    // handler stayed unset -> the fourcc fallback still routed avc1
    assert(info.codec == "avc1", s"fallback lost: ${info.codec}")
  }

  test("mp4: an all-ones mvhd duration (the spec's 'cannot be " +
      "determined' sentinel) reports 0, not 49.7 days") {
    val ftyp = box("ftyp", cat(cc("isom"), be32(512), cc("isom")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(1000), be32(0xffffffffL), Array.fill[Byte](80)(0)))
    val videoEntry = cat(be32(86), cc("avc1"), Array.fill[Byte](78)(0))
    val moov = box("moov", cat(mvhd, trakHSC("vide", videoEntry, 10)))
    val info = MediaProbe.probe(cat(ftyp, moov)).get
    assert(info.durationMs == 0,
      s"unknown-duration sentinel leaked: ${info.durationMs}")
    assert(info.codec == "avc1")
  }

  test("mp4: a truncated stsd does not read codec bytes from the " +
      "next sibling box") {
    // stsd declares only ver/flags + entry_count + 8 bytes — the
    // "entry" fourcc position lands on the following stsz header,
    // which must NOT be reported as the codec
    val ftyp = box("ftyp", cat(cc("isom"), be32(512), cc("isom")))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0),
      be32(1000), be32(5000), Array.fill[Byte](80)(0)))
    val stsd = box("stsd", cat(be32(0), be32(1), be32(86), be32(0)))
    val stsz = box("stsz", cat(be32(0), be32(0), be32(150)))
    val stbl = box("stbl", cat(stsd, stsz))
    val hdlr = box("hdlr", cat(be32(0), be32(0), cc("vide"),
      Array.fill[Byte](13)(0)))
    val trak = box("trak", box("mdia", cat(hdlr,
      box("minf", stbl))))
    val moov = box("moov", cat(mvhd, trak))
    val info = MediaProbe.probe(cat(ftyp, moov)).get
    assert(info.codec != "stsz",
      "sibling-box bytes reported as the codec")
    assert(info.durationMs == 5000)
  }

  test("webm: a second video track does not overwrite the kept " +
      "track's dimensions") {
    // two TrackEntry elements: V_VP9 640x360 then V_AV1 1920x1080 —
    // codec is first-wins, so dims must come from the SAME track
    def track(codec: String, w: Int, h: Int): Array[Byte] =
      ebml(Array[Byte](0xae.toByte), cat(
        ebml(Array[Byte](0x86.toByte), cc(codec)),
        ebml(Array[Byte](0xe0.toByte), cat(
          ebml(Array[Byte](0xb0.toByte), Array[Byte]((w >> 8).toByte, w.toByte)),
          ebml(Array[Byte](0xba.toByte), Array[Byte]((h >> 8).toByte, h.toByte))))))
    val header = ebml(Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte),
      ebml(Array[Byte](0x42, 0x82.toByte), cc("webm")))
    val tracks = ebml(Array[Byte](0x16, 0x54, 0xae.toByte, 0x6b.toByte),
      cat(track("V_VP9", 640, 360), track("V_AV1", 1920, 1080)))
    val seg = ebml(Array[Byte](0x18, 0x53, 0x80.toByte, 0x67.toByte), tracks)
    val info = MediaProbe.probe(cat(header, seg)).get
    assert(info.codec == "V_VP9")
    assert(info.width == 640 && info.height == 360,
      s"dims mixed across tracks: ${info.width}x${info.height}")
  }

  test("wav: a declared sample rate >= 2^31 yields None, not a " +
      "negative sampleRate") {
    val bad = cat(cc("RIFF"), le32(100), cc("WAVE"),
      cc("fmt "), le32(16), le16(1), le16(1), le32(0x80000000L),
      le32(16000), le16(2), le16(16),
      cc("data"), le32(4), Array[Byte](0, 0, 0, 0))
    assert(MediaProbe.probe(bad).isEmpty,
      "negative-rate WAV must not produce an info record")
  }

  test("ogg: an 'OggS' byte sequence INSIDE a packet payload is not " +
      "mistaken for the last page header") {
    // last page's payload embeds "OggS" + garbage granule bytes AFTER
    // the real header; the backward scan must reject the payload match
    // (version byte != 0 / malformed header) and keep the true granule
    def page(gran: Long, payload: Array[Byte]): Array[Byte] =
      cat(cc("OggS"), Array[Byte](0, 2), le64(gran), le32(1), le32(0),
        le32(0), Array[Byte](1, payload.length.toByte), payload)
    val head = cat(cc("OpusHead"), Array[Byte](1, 2), le16(312),
      le32(48000), le16(0), Array[Byte](0))
    val trap = cat(cc("OggS"), Array[Byte](9, 9), le64(999999999L),
      Array.fill[Byte](30)(0x41))
    val info = MediaProbe.probe(
      cat(page(0, head), page(96000, trap))).get
    assert(info.durationMs == (96000 - 312) * 1000L / 48000,
      s"payload 'OggS' poisoned the granule: $info")
  }

  // ----------------------------------------------------------- ebml

  test("webm: DocType, codecs, dims, rate, duration via TimecodeScale") {
    val info = MediaProbe.probe(webmFixture()).get
    assert(info.container == "webm" && info.codec == "V_VP9")
    assert(info.width == 640 && info.height == 360)
    assert(info.sampleRate == 48000 && info.channels == 2)
    assert(info.durationMs == 2500) // 2500 ticks * 1 ms scale
    assert(info.syncSamples == 0)   // no Cues element shipped
  }

  test("webm: Cues CuePoint count is the keyframe signal; 0xBB outside " +
      "Cues does not count") {
    // three CuePoints (CueTime child each) appended segment-level
    val cue = ebml(Array[Byte](0xbb.toByte),
      ebml(Array[Byte](0xb3.toByte), be16(0)))
    val cues = ebml(Array[Byte](0x1c, 0x53, 0xbb.toByte, 0x6b),
      cat(cue, cue, cue))
    val c = MediaProbe.probe(cat(webmFixture(), cues)).get
    assert(c.syncSamples == 3, s"cue points ${c.syncSamples}")
    // the same 0xBB element id at SEGMENT level (not inside Cues) is
    // some other element and must not inflate the keyframe count
    val stray = ebml(Array[Byte](0xbb.toByte), be16(7))
    val s = MediaProbe.probe(cat(webmFixture(), stray, cues)).get
    assert(s.syncSamples == 3, s"stray 0xBB counted: ${s.syncSamples}")
    // a Cues element whose declared size overruns the input is skipped
    // whole (the EBML walk's element-level bounding rule): count 0,
    // never a partial read into missing bytes
    val t = MediaProbe.probe(cat(webmFixture(), cues.dropRight(3))).get
    assert(t.syncSamples == 0, s"truncated cues ${t.syncSamples}")
  }

  test("webm: a realistic large Cues index (5000 points) counts fully " +
      "and does not starve the element walk") {
    // a 2 h movie at ~0.7 keyframes/s: far past the walk's global
    // 4096-element guard — the count must come from the dedicated flat
    // loop, and elements AFTER Cues must still parse (the DocType/
    // dims/duration here all come from BEFORE, so pin a track element
    // placed after the index instead)
    val cue = ebml(Array[Byte](0xbb.toByte),
      ebml(Array[Byte](0xb3.toByte), be16(0)))
    val n = 5000
    val cuesBody = cat(Seq.fill(n)(cue): _*)
    // the ~30 KB body needs a 4-byte VINT size (leading 0x10 marker)
    val sz = cuesBody.length
    val cues = cat(Array[Byte](0x1c, 0x53, 0xbb.toByte, 0x6b,
      0x10, ((sz >> 16) & 0xff).toByte, ((sz >> 8) & 0xff).toByte,
      (sz & 0xff).toByte), cuesBody)
    val after = ebml(Array[Byte](0x16, 0x54, 0xae.toByte, 0x6b),
      ebml(Array[Byte](0xae.toByte),
        ebml(Array[Byte](0x86.toByte), cc("A_OPUS"))))
    // a bare header + segment so the ONLY codec comes after the index
    val hdr = ebml(Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte),
      ebml(Array[Byte](0x42, 0x82.toByte), cc("webm")))
    val clip = cat(hdr,
      Array[Byte](0x18, 0x53, 0x80.toByte, 0x67, 0xff.toByte), cues, after)
    val info = MediaProbe.probe(clip).get
    assert(info.syncSamples == n, s"large cues ${info.syncSamples}")
    assert(info.codec == "A_OPUS", "post-Cues elements were not parsed")
  }

  // ----------------------------------------------------------- riff

  test("wav: fmt chunk fields + data size → exact duration") {
    val info = MediaProbe.probe(wavFixture()).get
    assert(info.container == "wav" && info.codec == "pcm")
    assert(info.sampleRate == 16000 && info.channels == 2)
    assert(info.durationMs == 2000) // 128000 B / 64000 B/s
    assert(info.bitrateKbps == 512)
  }

  test("avi: avih frame count/period + vids handler fourcc") {
    val info = MediaProbe.probe(aviFixture()).get
    assert(info.container == "avi" && info.codec == "mjpg")
    assert(info.width == 320 && info.height == 240)
    assert(info.frames == 250)
    assert(info.durationMs == 10000) // 250 * 40000 us
  }

  // ----------------------------------------------------- flac / gif

  test("flac: STREAMINFO rate/channels/total-samples without decode") {
    val info = MediaProbe.probe(flacFixture()).get
    assert(info.container == "flac" && info.sampleRate == 22050)
    assert(info.channels == 1 && info.frames == 44100)
    assert(info.durationMs == 2000)
  }

  test("gif: block walk counts frames and sums control delays") {
    val info = MediaProbe.probe(gifFixture(frames = 3, delayCs = 50)).get
    assert(info.width == 11 && info.height == 7)
    assert(info.frames == 3)
    assert(info.durationMs == 3 * 500)
  }

  test("wav: a chunk size near 2^32 cannot stall the walk (totality)") {
    // 0xFFFFFFF8 truncated to Int is -8: with Int arithmetic the chunk
    // walk would advance by exactly 0 bytes and loop forever — the walk
    // must advance in Long space and stop instead
    val evil = cat(cc("RIFF"), le32(100), cc("WAVE"),
      cc("JUNK"), le32(0xfffffff8L), Array.fill[Byte](8)(0))
    assert(MediaProbe.probe(evil).isEmpty) // and, crucially, returns
    // AVI twin: a LIST whose Int-truncated size would overflow the
    // cursor past the buffer must stop the walk, not crash it
    val evilAvi = cat(cc("RIFF"), le32(100), cc("AVI "),
      cc("LIST"), le32(0x7ffffff0L), cc("hdrl"), Array.fill[Byte](8)(0))
    assert(MediaProbe.probe(evilAvi).isEmpty)
  }

  // ------------------------------------------------------- totality

  test("probe is total: random bytes and every fixture truncation") {
    val rnd = new scala.util.Random(0xbeefL)
    (0 until 200).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      MediaProbe.probe(b) // must not throw
    }
    val fixtures = Seq(mp3Stream(3),
      // tagged variants put the Xing/VBRI parse paths (r11) under the
      // same truncation / bit-flip / lying-size fuzz as everything else
      cat(tagFrame("Xing", cat(be32(3), be32(100), be32(41700))),
        mp3Stream(2)),
      cat(tagFrame("VBRI", cat(be16(1), be16(0), be16(0),
        be32(20850), be32(50))), mp3Stream(2)),
      mp4Fixture(), m4aFixture(),
      oggOpusFixture(96000), oggVorbisFixture(88200),
      oggFlacFixture(44100), mp4TwoTrakFixture(),
      wavFixture(), aviFixture(), flacFixture(),
      gifFixture(2, 10), webmFixture(),
      cat(adtsFrame(60), adtsFrame(60), adtsFrame(60)),
      cat(adtsFrame(60, crc = true, blocks = 2),
        adtsFrame(60, crc = true, blocks = 2)),
      // r13 families under the same truncation / bit-flip fuzz
      aiffFixture("AIFF", cat(be16(2), be32(1000), be16(16),
        ext80(44100)), cat(cc("SSND"), be32(8L + 16), be32(0), be32(0),
        Array.fill[Byte](16)(0x22))),
      aiffFixture("AIFC", cat(be16(1), be32(500), be16(16),
        ext80(8000), cc("sowt"), Array[Byte](0, 0))),
      cat(cc(".snd"), be32(24), be32(64), be32(1), be32(8000),
        be32(1), Array.fill[Byte](64)(0x33)))
    fixtures.foreach { f =>
      (0 to f.length).foreach(n => MediaProbe.probe(f.take(n)))
      // bit-flipped copies exercise the validation branches
      (0 until f.length by 7).foreach { i =>
        val c = f.clone(); c(i) = (c(i) ^ 0x80).toByte
        MediaProbe.probe(c)
      }
      // adversarial sizes: stamp 0xFFFFFFFF over every 4-byte window —
      // the declared-size overflow class (Int truncation of a near-2^32
      // length) must stop a walk, never stall or crash it
      (0 until math.max(0, f.length - 4) by 5).foreach { i =>
        val c = f.clone()
        var j = 0
        while (j < 4) { c(i + j) = 0xff.toByte; j += 1 }
        MediaProbe.probe(c)
      }
    }
  }

  test("concatenated-corpus scanner order: a clip followed by ANY " +
      "other family's full bytes keeps its own classification") {
    // the r12 ADTS/mp3 lesson generalized to every family pair:
    // misclassification shows up BETWEEN probes, not within one. A
    // probe window over a concatenated archive (tar, multi-file dump)
    // sees clip A's bytes at offset 0 with clip B's complete bytes —
    // including B's magic — in the tail; the classification must be
    // A's for every ordered pair, whatever the probe dispatch order
    // or window-scan reach (probeAdts/probeMp3 scan 64 KB windows and
    // would otherwise steal a tail's sync run).
    val fams: Seq[(String, Array[Byte])] = Seq(
      "mp3" -> mp3Stream(3),
      "adts" -> cat(adtsFrame(60), adtsFrame(60), adtsFrame(60)),
      "wav" -> wavFixture(),
      "avi" -> aviFixture(),
      "flac" -> flacFixture(),
      "gif" -> gifFixture(2, 10),
      "webm" -> webmFixture(),
      "mp4" -> mp4Fixture(),
      "ogg" -> oggVorbisFixture(88200),
      "aiff" -> aiffFixture("AIFF", cat(be16(2), be32(1000), be16(16),
        ext80(44100))),
      "aifc" -> aiffFixture("AIFC", cat(be16(1), be32(500), be16(16),
        ext80(8000), cc("sowt"), Array[Byte](0, 0))),
      "au" -> cat(cc(".snd"), be32(24), be32(64), be32(1), be32(8000),
        be32(1), Array.fill[Byte](64)(0x33)))
    val solos = fams.map { case (label, bytes) =>
      val s = MediaProbe.probe(bytes).getOrElse(
        fail(s"$label solo did not probe"))
      (label, bytes, s)
    }
    for ((la, a, sa) <- solos; (lb, b, _) <- solos if lb != la) {
      val info = MediaProbe.probe(cat(a, b))
      assert(info.nonEmpty, s"$la followed by $lb did not probe")
      assert(info.get.container == sa.container &&
        info.get.codec == sa.codec,
        s"$la followed by $lb stolen: ${info.get.container}/" +
          s"${info.get.codec} (expected ${sa.container}/${sa.codec})")
    }
  }

  // -------------------------------------------------- spark plumbing

  test("every MediaFixtures id probes with a recognized container " +
      "and positive duration (0..210, 30 per family)") {
    // the q138 test pins exact fields at 100 Spark-driven ids; this
    // direct loop widens the id range so every family's parameter
    // cycle (frame counts, tag variants, header shapes, durations)
    // is exercised end-to-end at least 30 times
    (0L until 210L).foreach { id =>
      val (_, bytes) = graft.pipeline.MediaFixtures.synth(id)
      val info = MediaProbe.probe(bytes).getOrElse(
        fail(s"fixture id $id did not probe"))
      assert(info.container.nonEmpty && info.codec.nonEmpty, s"id $id")
      assert(info.durationMs > 0, s"id $id zero duration")
    }
  }

  test("q138: every synthetic clip probes; per-format fields are exact") {
    val out = SparkEntry.queries("q138_media_probe")(spark, sf).collect()
    assert(out.length == 100) // every format family recognized, no drops
    val byContainer = out.groupBy(_.getString(1)).view.mapValues(_.length)
    // 100 ids round-robin over 7 slots (residues 0-1 get 15, 2-6 get
    // 14); the uncompressed-audio slot (residue 1) further walks
    // wav/aiff/au by (id/7)%3, and every second aiff id is AIFC
    assert(byContainer("mpeg-audio") == 15 && byContainer("wav") == 5 &&
      byContainer("aiff") == 3 && byContainer("aifc") == 2 &&
      byContainer("au") == 5 &&
      byContainer("gif") == 14 && byContainer("isom") == 14 &&
      byContainer("ogg") == 14 && byContainer("webm") == 14 &&
      byContainer("adts") == 14)
    // spot-exact fields per family (id → synth parameters; mp3 ids step
    // by 7 so the tag variant (id/7)%3 cycles tagless/Xing/VBRI)
    val r0 = out.find(_.getLong(0) == 0).get  // mp3, 2 frames, tagless
    assert(r0.getString(2) == "mp3" &&
      r0.getLong(6) == 2 * 1152L * 1000 / 44100 && r0.getLong(9) == 2)
    // ids 7 (Xing) and 14 (VBRI) carry header frames declaring the
    // shipped totals — declared fields must equal the tagless formula
    // and the header frame must not count as audio
    val r7 = out.find(_.getLong(0) == 7).get  // Xing, 2+7%9 = 9 frames
    assert(r7.getString(2) == "mp3" && r7.getLong(9) == 9 &&
      r7.getLong(6) == 9 * 1152L * 1000 / 44100)
    val r14 = out.find(_.getLong(0) == 14).get // VBRI, 2+14%9 = 7 frames
    assert(r14.getString(2) == "mp3" && r14.getLong(9) == 7 &&
      r14.getLong(6) == 7 * 1152L * 1000 / 44100)
    val r22 = out.find(_.getLong(0) == 22).get // wav, (1 + 22%5)*0.25 s
    assert(r22.getString(2) == "pcm" && r22.getLong(6) == 750)
    // id 8: plain AIFF — big-endian pcm, 16000 frames at the 80-bit
    // extended 16 kHz, stereo s16 => 1 s, 512 kbps declared
    val r8 = out.find(_.getLong(0) == 8).get
    assert(r8.getString(1) == "aiff" && r8.getString(2) == "pcm_s16be" &&
      r8.getInt(3) == 16000 && r8.getInt(4) == 2 &&
      r8.getLong(6) == 1000 && r8.getLong(9) == 16000 &&
      r8.getInt(5) == 512)
    // id 29: AIFC with the 'sowt' byte-swap fourcc => little-endian pcm
    val r29 = out.find(_.getLong(0) == 29).get
    assert(r29.getString(1) == "aifc" && r29.getString(2) == "pcm_s16le" &&
      r29.getLong(6) == 1250, s"aifc: $r29")
    // id 15: Sun AU G.711 mu-law mono 8 kHz, 2000 one-byte samples
    val r15 = out.find(_.getLong(0) == 15).get
    assert(r15.getString(1) == "au" && r15.getString(2) == "ulaw" &&
      r15.getInt(3) == 8000 && r15.getInt(4) == 1 &&
      r15.getLong(6) == 250 && r15.getLong(9) == 2000 &&
      r15.getInt(5) == 64)
    val r9 = out.find(_.getLong(0) == 9).get  // gif, 1 + 9%4 = 2 frames
    assert(r9.getLong(9) == 2 && r9.getInt(7) == 11 && r9.getInt(8) == 7)
    val r3 = out.find(_.getLong(0) == 3).get  // mp4, (1 + 3%6) = 4 s
    assert(r3.getString(2) == "avc1" && r3.getLong(6) == 4000 &&
      r3.getLong(9) == 96 && r3.getInt(7) == 320)
    // r10 sample-table fields (synth stts/stsc/stsz, id 3 → 96 samples):
    // track duration sums the stts runs exactly (95·41 + 105 = 4000);
    // fps = 96·1000·1000/4000 = 24000 millihertz; sizes cycle
    // 100+((3+i)%50) → Σ = 11998, max = 149; chunks = 2 runs of 10 +
    // ceil(76/7) = 13
    assert(r3.getLong(10) == 4000, s"track_dur_ms ${r3.getLong(10)}")
    assert(r3.getLong(11) == 24000, s"fps_milli ${r3.getLong(11)}")
    assert(r3.getLong(12) == 11998, s"sample_bytes ${r3.getLong(12)}")
    assert(r3.getLong(13) == 149, s"max_sample_bytes ${r3.getLong(13)}")
    assert(r3.getLong(14) == 13, s"chunks ${r3.getLong(14)}")
    // stss (r12): one sync sample per second of the 4 s clip — the
    // GOP-length signal a keyframe-sampling stage plans against
    assert(r3.getLong(15) == 4, s"sync_samples ${r3.getLong(15)}")
    // non-ISO-BMFF families report 0 sample-table fields, not garbage
    assert(r0.getLong(12) == 0 && r9.getLong(14) == 0 &&
      r0.getLong(15) == 0)
    val r4 = out.find(_.getLong(0) == 4).get // ogg, 24000*(1+4%4)/48k
    // minus the 312-sample pre-skip the id header declares (RFC 7845)
    assert(r4.getString(2) == "opus" && r4.getLong(6) == 493)
    val r5 = out.find(_.getLong(0) == 5).get // webm, (1+5%3)*1000 ticks
    assert(r5.getString(1) == "webm" && r5.getString(2) == "V_VP9" &&
      r5.getLong(6) == 3000 && r5.getInt(7) == 256 && r5.getInt(8) == 144)
    // Cues (r12): one CuePoint per second — the webm keyframe signal
    assert(r5.getLong(15) == 3, s"webm cue points ${r5.getLong(15)}")
    // adts (r12): ids 6/13/20 walk the three header shapes — plain
    // 7-byte, CRC-protected 9-byte, and two raw blocks per frame
    val r6 = out.find(_.getLong(0) == 6).get  // plain, 2+6%9 = 8 frames
    assert(r6.getString(1) == "adts" && r6.getString(2) == "aac-lc" &&
      r6.getInt(3) == 44100 && r6.getInt(4) == 2 && r6.getLong(9) == 8 &&
      r6.getLong(6) == 8 * 1024L * 1000 / 44100)
    val r13 = out.find(_.getLong(0) == 13).get // CRC, 2+13%9 = 6 frames
    assert(r13.getString(1) == "adts" && r13.getLong(9) == 6 &&
      r13.getLong(6) == 6 * 1024L * 1000 / 44100)
    val r20 = out.find(_.getLong(0) == 20).get // 2 blocks, 2+20%9 = 4 frames
    assert(r20.getString(1) == "adts" && r20.getLong(9) == 4 &&
      r20.getLong(6) == 4 * 2048L * 1000 / 44100)
  }

  test("probeMetadata is stream-safe: identical rows from a stream") {
    // the probe is a stateless per-row flatMap, so the SAME call works
    // on a streaming frame — pinning the SCALE.md claim. Batch run vs
    // a two-micro-batch MemoryStream run over identical bytes must
    // produce identical typed rows.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val clips = (0L until 10L).map(graft.pipeline.MediaFixtures.synth)
    val batch = Multimodal.probeMetadata(spark,
      Multimodal.asMediaFrame(clips.toDF("id", "bytes"), "id", "mixed",
        "bytes")).collect().map(_.toString).sorted
    val in = MemoryStream[(Long, Array[Byte])]
    val sdf = Multimodal.probeMetadata(spark,
      Multimodal.asMediaFrame(in.toDF().toDF("id", "bytes"), "id", "mixed",
        "bytes"))
    assert(sdf.isStreaming)
    val q = sdf.writeStream.outputMode("append")
      .format("memory").queryName("probe_stream").start()
    try {
      in.addData(clips.take(5)); q.processAllAvailable()
      in.addData(clips.drop(5)); q.processAllAvailable()
      val streamed = spark.table("probe_stream")
        .collect().map(_.toString).sorted
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("probeMetadata: typed per-clip rows over a mixed media frame") {
    import spark.implicits._
    val media = Multimodal.asMediaFrame(
      Seq((1L, mp3Stream(5)), (2L, mp4Fixture()), (3L, wavFixture()),
        (4L, Array.fill[Byte](64)(9))) // unrecognized → dropped
        .toDF("id", "bytes"), "id", "audio", "bytes")
    val out = Multimodal.probeMetadata(spark, media)
      .orderBy("media_id").collect()
    assert(out.length == 3) // row 4 dropped, pipeline-wide policy
    assert(out.map(_.getString(1)).toSeq == Seq("mpeg-audio", "isom", "wav"))
    assert(out(0).getString(2) == "mp3" && out(2).getString(2) == "pcm")
  }
}
