package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north-star surface): treat
  * image/audio/video payloads as opaque `binary` columns with typed metadata,
  * and run decode / feature-extract steps as batched per-partition functions
  * — the Scala analog of `mapInPandas` (batch in, batch out, schema fixed up
  * front).
  *
  * Two decoders behind the pluggable seam:
  *  - [[HeaderParseDecoder]] — a REAL image decode (round-15 directive #1):
  *    PNG / JPEG / GIF dimensions parsed from the raw container bytes in
  *    pure Scala (the format headers are public specs; no external codec
  *    jars needed for metadata). Unknown/corrupt payloads yield nulls,
  *    never throw — a 100 TB crawl corpus always carries malformed bytes.
  *  - [[StubDecoder]] — the original deterministic fake, kept for the
  *    plumbing oracle (`q_mm_decode_stub`) and for media kinds whose
  *    decode genuinely needs codec libs this container lacks (audio/video
  *    frames).
  */
object Multimodal {

  /** Decoded-media metadata record (what a real image decode would yield). */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      channels: Long)

  /** The pluggable decoder contract: one batch of byte payloads in, one batch
    * of metadata out. A real implementation would wrap an image codec; the
    * stub derives metadata arithmetically from payload size so an SQL oracle
    * can verify the plumbing end-to-end. */
  trait MediaDecoder extends Serializable {
    def decode(batch: Seq[(Long, Array[Byte])]): Seq[MediaMeta]
  }

  object StubDecoder extends MediaDecoder {
    def decode(batch: Seq[(Long, Array[Byte])]): Seq[MediaMeta] =
      batch.map { case (id, bytes) =>
        val n = bytes.length.toLong
        MediaMeta(id, n, 64L + n % 577, 64L + (n * 7) % 481, 1L + n % 4)
      }
  }

  /** SQL mirror of [[StubDecoder]] for the oracle. */
  def stubDecodeSql(nBytes: String): String =
    s"64 + $nBytes % 577 AS width, 64 + ($nBytes * 7) % 481 AS height, 1 + $nBytes % 4 AS channels"

  /** Decoded IMAGE metadata — the real-decode record: nullable fields
    * because a corpus payload can be any bytes (`format`/dims null when no
    * known container parses). */
  final case class ImageMeta(
      doc_id: Long,
      n_bytes: Long,
      format: Option[String],
      width: Option[Long],
      height: Option[Long],
      channels: Option[Long])

  /** The image-decode seam — same batched contract as [[MediaDecoder]],
    * richer (nullable) output schema. */
  trait ImageDecoder extends Serializable {
    def decodeImages(batch: Seq[(Long, Array[Byte])]): Seq[ImageMeta]
  }

  /** REAL image metadata decode from raw container bytes — pure Scala
    * parsers of the public PNG (IHDR chunk), JPEG (SOFn frame header) and
    * GIF (logical screen descriptor) layouts; no codec jars. Contract:
    * total — any byte array yields a row; unknown/truncated/corrupt
    * payloads yield null format/dims, NEVER an exception (a 100 TB crawl
    * corpus always contains malformed bytes, and one bad payload must not
    * fail a 10⁹-row decode stage). */
  object HeaderParseDecoder extends ImageDecoder {

    def decodeImages(batch: Seq[(Long, Array[Byte])]): Seq[ImageMeta] =
      batch.map { case (id, bytes) =>
        val parsed =
          try parseImage(bytes)
          catch { case scala.util.control.NonFatal(_) => None }
        parsed match {
          case Some((fmt, w, h, c)) =>
            ImageMeta(id, bytes.length.toLong, Some(fmt), Some(w), Some(h), Some(c))
          case None =>
            ImageMeta(id, bytes.length.toLong, None, None, None, None)
        }
      }

    /** (format, width, height, channels) if the payload starts with a known
      * image container. */
    def parseImage(b: Array[Byte]): Option[(String, Long, Long, Long)] =
      parsePng(b).orElse(parseJpeg(b)).orElse(parseGif(b))

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Long = (u8(b, i) << 8 | u8(b, i + 1)).toLong
    private def be32(b: Array[Byte], i: Int): Long =
      ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3))
    private def le16(b: Array[Byte], i: Int): Long = (u8(b, i) | u8(b, i + 1) << 8).toLong

    /** PNG: 8-byte signature, then the IHDR chunk (length + "IHDR" + 13
      * data bytes: width u32be, height u32be, bit depth, color type, …).
      * Channels from the color type: 0 gray, 2 rgb, 3 palette, 4 gray+α,
      * 6 rgba. */
    private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    def parsePng(b: Array[Byte]): Option[(String, Long, Long, Long)] = {
      if (b.length < 29 || !PngSig.indices.forall(i => u8(b, i) == PngSig(i))) return None
      // first chunk must be IHDR with its fixed 13-byte payload
      if (be32(b, 8) != 13L || !"IHDR".getBytes.indices.forall(i => b(12 + i) == "IHDR".getBytes()(i)))
        return None
      val channels = u8(b, 25) match {
        case 0 => 1L; case 2 => 3L; case 3 => 1L; case 4 => 2L; case 6 => 4L
        case _ => return None
      }
      val (w, h) = (be32(b, 16), be32(b, 20))
      if (w <= 0 || h <= 0) None else Some(("png", w, h, channels))
    }

    /** JPEG: SOI (FFD8), then marker segments `FF xx len₂ …` — skip until a
      * start-of-frame marker SOFn (C0–CF except C4 DHT / C8 JPG / CC DAC),
      * whose payload is precision(1), height u16be, width u16be,
      * n_components(1). Standalone markers (D0–D9) carry no length; fill
      * FF bytes before a marker are legal padding. */
    def parseJpeg(b: Array[Byte]): Option[(String, Long, Long, Long)] = {
      if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return None // desynchronized — not a marker
        var j = i
        while (j < b.length && u8(b, j) == 0xff) j += 1 // skip fill bytes
        if (j >= b.length) return None
        val marker = u8(b, j)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (j + 8 >= b.length) return None
          val h = be16(b, j + 4)
          val w = be16(b, j + 6)
          val c = u8(b, j + 8).toLong
          return if (w <= 0 || h <= 0 || c <= 0) None else Some(("jpeg", w, h, c))
        }
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i = j + 1 // standalone marker: no length field
        } else if (marker == 0xd9) {
          return None // EOI before any SOF
        } else {
          if (j + 2 >= b.length) return None
          val len = be16(b, j + 1).toInt
          if (len < 2) return None
          i = j + 1 + len
        }
      }
      None
    }

    /** GIF: "GIF87a"/"GIF89a", then the logical screen descriptor — width
      * u16le, height u16le. Palette-indexed RGB → 3 channels. */
    def parseGif(b: Array[Byte]): Option[(String, Long, Long, Long)] = {
      if (b.length < 10) return None
      val sig = new String(b, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return None
      val (w, h) = (le16(b, 6), le16(b, 8))
      if (w <= 0 || h <= 0) None else Some(("gif", w, h, 3L))
    }
  }

  /** Decoded AUDIO metadata (nullable like [[ImageMeta]] — any bytes may
    * arrive). `n_samples` = data-chunk frames (duration = n_samples /
    * sample_rate). */
  final case class AudioMeta(
      doc_id: Long,
      n_bytes: Long,
      format: Option[String],
      sample_rate: Option[Long],
      channels: Option[Long],
      bits: Option[Long],
      n_samples: Option[Long])

  /** REAL audio metadata decode: WAV/RIFF chunk scan in pure Scala (the
    * RIFF container is a public spec; PCM metadata needs no codec). Total:
    * unknown/truncated/corrupt bytes → nulls, never throws. Compressed
    * codecs (mp3/ogg) stay out of scope — those genuinely need decoder
    * libs this container lacks; the WAV path retires the "no audio libs"
    * premise for the metadata layer the pipeline actually filters on. */
  object WavParser extends Serializable {

    /** (sample_rate, channels, bits, n_samples) for a RIFF/WAVE payload
      * whose fmt chunk precedes data — scanning chunks properly (a LIST or
      * fact chunk between them is skipped, odd chunk sizes padded per the
      * RIFF rule). */
    def parseWav(b: Array[Byte]): Option[(Long, Long, Long, Long)] = {
      try {
        def u8(i: Int) = b(i) & 0xff
        def le16(i: Int): Long = (u8(i) | u8(i + 1) << 8).toLong
        def le32(i: Int): Long =
          u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
        def tag(i: Int): String =
          if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""
        if (b.length < 36 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
        var i = 12
        var fmt = Option.empty[(Long, Long, Long)] // (rate, channels, bits→blockAlign)
        var blockAlign = 0L
        while (i + 8 <= b.length) {
          val id = tag(i)
          val size = le32(i + 4)
          if (size < 0 || i + 8 + size > b.length) return None
          if (id == "fmt ") {
            if (size < 16) return None
            val channels = le16(i + 10)
            val rate = le32(i + 12)
            blockAlign = le16(i + 20)
            val bits = le16(i + 22)
            if (channels <= 0 || rate <= 0 || bits <= 0 || blockAlign <= 0) return None
            fmt = Some((rate, channels, bits))
          } else if (id == "data") {
            return fmt.map { case (rate, ch, bits) =>
              (rate, ch, bits, size / blockAlign)
            }
          }
          i += 8 + size.toInt + (size.toInt & 1) // RIFF pads odd chunks
        }
        None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    def decode(batch: Seq[(Long, Array[Byte])]): Seq[AudioMeta] =
      batch.map { case (id, bytes) =>
        parseWav(bytes) match {
          case Some((rate, ch, bits, n)) =>
            AudioMeta(id, bytes.length.toLong, Some("wav"),
              Some(rate), Some(ch), Some(bits), Some(n))
          case None =>
            AudioMeta(id, bytes.length.toLong, None, None, None, None, None)
        }
      }
  }

  /** REAL compressed-audio metadata decode: MPEG Layer III (MP3) frame
    * headers (round-16 directive #5; extended to MPEG-2/2.5 and VBR in
    * round 18). The frame header is a public spec — version-indexed
    * bitrate/sample-rate tables, frame-length arithmetic, ID3v2 container
    * skip (footer-flag aware), Xing/Info and VBRI VBR headers — and parses
    * without any codec: only the PCM payload needs a decoder, the metadata
    * the pipeline filters on does not. Total: unknown/truncated/corrupt
    * bytes → None, never throws.
    *
    * Scope: MPEG-1, MPEG-2, and MPEG-2.5 Layer III streams, CBR or VBR.
    * Strict per version: every frame must parse with a consistent version /
    * sample rate / channel mode (per-frame BITRATE and padding vary — that
    * is what VBR is) and the frames must tile the payload exactly — a
    * desynchronized or truncated stream is rejected rather than half-read,
    * which keeps the closed-form oracle honest. A Xing/Info/VBRI header in
    * the first frame is cross-checked against the walk: its frames field
    * counts the AUDIO frames following the (audio-free) header frame, so a
    * count that disagrees with the tiling is rejected too. */
  object Mp3Parser extends Serializable {

    /** Layer III bitrate tables (kbps), indexed by the header's 4-bit
      * bitrate field; 0 = free-format, 15 = reserved (both rejected).
      * MPEG-2 and MPEG-2.5 share the low-rate table. */
    private val BitrateV1 =
      Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
    private val BitrateV2 =
      Array(-1, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1)
    /** Sample-rate tables, indexed by the 2-bit field; 3 = reserved.
      * MPEG-2 halves and MPEG-2.5 quarters the MPEG-1 rates. */
    private val SampleRateV1 = Array(44100L, 48000L, 32000L, -1L)
    private val SampleRateV2 = Array(22050L, 24000L, 16000L, -1L)
    private val SampleRateV25 = Array(11025L, 12000L, 8000L, -1L)
    /** Samples per Layer III frame: 1152 (MPEG-1), 576 (MPEG-2/2.5). */
    val SamplesPerFrame = 1152L
    val SamplesPerFrameV2 = 576L

    /** (sample_rate, channels, first_frame_bitrate_kbps, n_samples) for a
      * Layer III payload, optionally prefixed by an ID3v2 tag. */
    def parseMp3(b: Array[Byte]): Option[(Long, Long, Long, Long)] = {
      try {
        def u8(i: Int) = b(i) & 0xff
        def be32(i: Int): Long =
          (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
        var i = 0L
        // ID3v2 prefix: "ID3" + version(2) + flags(1) + syncsafe u28 size;
        // the footer flag (0x10) adds a 10-byte footer AFTER the tag body
        // that the size field does not count (ADVICE r17: without this a
        // footered tag desyncs the frame walk and nulls a valid file)
        if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
          val size = ((u8(6) & 0x7f).toLong << 21) | ((u8(7) & 0x7f) << 14) |
            ((u8(8) & 0x7f) << 7) | (u8(9) & 0x7f)
          i = 10L + size + (if ((u8(5) & 0x10) != 0) 10L else 0L)
        }
        var ver = -1; var rate = -1L; var ch = -1L; var firstBr = -1L
        var frames = 0L
        var vbrHeader = false // first frame carries a Xing/Info/VBRI tag
        var vbrFrames = Option.empty[Long] // its frames field, when present
        while (i < b.length) {
          if (i + 4 > b.length) return None
          val j = i.toInt
          // 11-bit sync, then version(2)/layer(2)/protection(1)
          if (u8(j) != 0xff || (u8(j + 1) & 0xe0) != 0xe0) return None
          val version = (u8(j + 1) >> 3) & 0x3 // 0 = MPEG-2.5, 2 = MPEG-2, 3 = MPEG-1
          val layer = (u8(j + 1) >> 1) & 0x3 // 1 = Layer III
          if (version == 1 || layer != 1) return None // 1 = reserved version
          val br = (if (version == 3) BitrateV1 else BitrateV2)(
            (u8(j + 2) >> 4) & 0xf)
          val sr = (version match {
            case 3 => SampleRateV1
            case 2 => SampleRateV2
            case _ => SampleRateV25
          })((u8(j + 2) >> 2) & 0x3)
          val padding = (u8(j + 2) >> 1) & 0x1
          val mode = (u8(j + 3) >> 6) & 0x3 // 3 = mono
          if (br <= 0 || sr <= 0) return None
          val c = if (mode == 3) 1L else 2L
          if (frames == 0L) { ver = version; rate = sr; ch = c; firstBr = br.toLong }
          else if (version != ver || sr != rate || c != ch) return None
          // Layer III frame length: floor(coef · bitrate / sample_rate) + pad;
          // coef = 144 for MPEG-1, 72 for MPEG-2/2.5 (samples-per-frame halves)
          val coef = if (version == 3) 144000L else 72000L
          val frameLen = coef * br / sr + padding
          if (frameLen <= 4L) return None
          if (frames == 0L) {
            // VBR header detect, first frame only: Xing/Info sits right
            // after the side info (MPEG-1: 17 mono / 32 stereo bytes;
            // MPEG-2/2.5: 9 / 17), VBRI at a fixed 32 bytes past the
            // header. Both carry a frames field counting the audio frames
            // that follow this (audio-free) header frame.
            val side =
              if (version == 3) { if (mode == 3) 17 else 32 }
              else { if (mode == 3) 9 else 17 }
            val xat = j + 4 + side
            val vat = j + 4 + 32
            def tagIs(at: Int, t: String): Boolean =
              at + 4 <= b.length && i + (at - j) + 4 <= i + frameLen &&
                b(at) == t(0).toByte && b(at + 1) == t(1).toByte &&
                b(at + 2) == t(2).toByte && b(at + 3) == t(3).toByte
            // payload reads bounded by the buffer AND the first frame's
            // extent, as tagIs already does for the tag itself: at minimum
            // MPEG-2.5 frame sizes the flags/frames fields would otherwise
            // read the NEXT frame's bytes and silently mis-parse the header
            def fits(at: Int, len: Int): Boolean =
              at + len <= b.length && (at - j) + len <= frameLen
            if (tagIs(xat, "Xing") || tagIs(xat, "Info")) {
              // "Xing" + u32 flags [+ u32 frames if flags bit 0]. The tag
              // marks the frame as audio-free even when the frames field
              // is ABSENT (flags bit 0 clear — a TOC-only header): the
              // header frame must not contribute phantom samples either way
              vbrHeader = true
              if (fits(xat, 8) && (be32(xat + 4) & 0x1L) != 0 && fits(xat, 12))
                vbrFrames = Some(be32(xat + 8))
            } else if (tagIs(vat, "VBRI")) {
              // "VBRI" + ver(2) delay(2) quality(2) bytes(4) frames(4)
              vbrHeader = true
              if (fits(vat, 18)) vbrFrames = Some(be32(vat + 14))
            }
          }
          i += frameLen
          frames += 1L
        }
        if (frames == 0L || i != b.length) return None
        val spf = if (ver == 3) SamplesPerFrame else SamplesPerFrameV2
        // audio frames = walked frames minus the audio-free header frame
        // (when one was detected, with or without a frames field)
        val audioFrames = if (vbrHeader) frames - 1L else frames
        vbrFrames match {
          case Some(n) =>
            // strictness: the declared frame count must match the tiling —
            // a VBR header that disagrees with the stream is a desync, not
            // metadata. In-the-wild encoders disagree on whether the field
            // counts the header frame itself, so BOTH conventions are
            // consistent: n = audio frames (exclude-header) or n = total
            // walked frames (include-header). Samples always come from the
            // tiling-derived audio-frame count — the header frame is
            // audio-free under either convention.
            if (n != audioFrames && n != frames) None
            else Some((rate, ch, firstBr, audioFrames * spf))
          case None => Some((rate, ch, firstBr, audioFrames * spf))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    def decode(batch: Seq[(Long, Array[Byte])]): Seq[AudioMeta] =
      batch.map { case (id, bytes) =>
        parseMp3(bytes) match {
          case Some((rate, ch, _, n)) =>
            // bits-per-sample is a PCM notion; null for a compressed codec
            AudioMeta(id, bytes.length.toLong, Some("mp3"),
              Some(rate), Some(ch), None, Some(n))
          case None =>
            AudioMeta(id, bytes.length.toLong, None, None, None, None, None)
        }
      }
  }

  /** Decoded VIDEO-container metadata (nullable like [[ImageMeta]]).
    * `duration` is in `timescale` ticks (seconds = duration / timescale) —
    * kept separate rather than pre-divided so downstream filters stay
    * exact-integer. */
  final case class VideoMeta(
      doc_id: Long,
      n_bytes: Long,
      format: Option[String],
      width: Option[Long],
      height: Option[Long],
      timescale: Option[Long],
      duration: Option[Long])

  /** REAL video-container metadata decode: ISO-BMFF (MP4/MOV) box walk
    * (round-16 directive #5). The box structure is a public spec — length-
    * prefixed 4cc boxes, `moov/mvhd` for timescale+duration, the first
    * `moov/trak/tkhd` for the presentation width/height (16.16 fixed
    * point) — and none of it needs a codec. Handles 64-bit `largesize`
    * boxes, version-1 (64-bit time) mvhd/tkhd, and size-0 ("to end of
    * file") top-level boxes. Total: anything malformed → None. */
  object Mp4Parser extends Serializable {

    def parseMp4(b: Array[Byte]): Option[(Long, Long, Long, Long)] = {
      try {
        def u8(i: Int) = b(i) & 0xff
        def be32(i: Int): Long =
          (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
        def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
        def tag(i: Int): String =
          if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""
        // first box of `name` inside [start, end) → payload span. ISO-BMFF
        // permits size 0 ("extends to end of file") only for the LAST
        // TOP-LEVEL box — honoring it in a nested span would let one
        // malformed child silently swallow the rest of its parent (ADVICE
        // r17), so it is accepted only when the span IS the whole file.
        def findBox(start: Long, end: Long, name: String): Option[(Long, Long)] = {
          val topLevel = start == 0L && end == b.length.toLong
          var i = start
          while (i + 8 <= end) {
            val sz0 = be32(i.toInt)
            var hdr = 8L
            val sz =
              if (sz0 == 1L) { // largesize
                if (i + 16 > end) return None
                hdr = 16L; be64(i.toInt + 8)
              } else if (sz0 == 0L) {
                if (!topLevel) return None
                end - i // last top-level box extends to end of file
              } else sz0
            if (sz < hdr || i + sz > end) return None
            if (tag(i.toInt + 4) == name) return Some((i + hdr, i + sz))
            i += sz
          }
          None
        }
        if (b.length < 16) return None
        // sanity: a real file leads with ftyp (or a bare moov)
        val lead = tag(4)
        if (lead != "ftyp" && lead != "moov") return None
        val (moovS, moovE) = findBox(0L, b.length.toLong, "moov") match {
          case Some(x) => x; case None => return None
        }
        val (mvhdS, mvhdE) = findBox(moovS, moovE, "mvhd") match {
          case Some(x) => x; case None => return None
        }
        val m = mvhdS.toInt
        if (mvhdE - mvhdS < 20) return None
        val (timescale, duration) = u8(m) match {
          case 0 => (be32(m + 12), be32(m + 16)) // v0: u32 times
          case 1 => if (mvhdE - mvhdS < 32) return None
            (be32(m + 20), be64(m + 24)) // v1: u64 creation/modification
          case _ => return None
        }
        // dimensions: scan ALL traks for the first with nonzero 16.16
        // width/height (the final 8 bytes of its tkhd) — real muxers often
        // put the audio trak (dims 0×0) before the video trak, and taking
        // only the first trak would null out a well-formed video file. An
        // audio-only container (m4a) has no dimensioned trak → None (this
        // is the VIDEO metadata decode; WAV/MP3 cover the audio face).
        var searchFrom = moovS
        var dims = Option.empty[(Long, Long)]
        var more = true
        while (dims.isEmpty && more) {
          findBox(searchFrom, moovE, "trak") match {
            case None => more = false
            case Some((trakS, trakE)) =>
              searchFrom = trakE
              findBox(trakS, trakE, "tkhd").foreach { case (tkhdS, tkhdE) =>
                if (tkhdE - tkhdS >= 12) {
                  val w = be32((tkhdE - 8).toInt) >> 16
                  val h = be32((tkhdE - 4).toInt) >> 16
                  if (w > 0 && h > 0) dims = Some((w, h))
                }
              }
          }
        }
        dims match {
          case Some((w, h)) if timescale > 0 && duration >= 0 =>
            Some((w, h, timescale, duration))
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    def decode(batch: Seq[(Long, Array[Byte])]): Seq[VideoMeta] =
      batch.map { case (id, bytes) =>
        parseMp4(bytes) match {
          case Some((w, h, ts, dur)) =>
            VideoMeta(id, bytes.length.toLong, Some("mp4"),
              Some(w), Some(h), Some(ts), Some(dur))
          case None =>
            VideoMeta(id, bytes.length.toLong, None, None, None, None, None)
        }
      }
  }

  /** Batched MP3 decode — same mapPartitions plumbing as
    * [[decodeImageMeta]]. */
  def decodeMp3Meta(
      df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => Mp3Parser.decode(g)))
  }

  /** Batched MP4 decode — same mapPartitions plumbing as
    * [[decodeImageMeta]]. */
  def decodeVideoMeta(
      df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): Dataset[VideoMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => Mp4Parser.decode(g)))
  }

  /** Batched audio decode — same mapPartitions plumbing as
    * [[decodeImageMeta]]. */
  def decodeAudioMeta(
      df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => WavParser.decode(g)))
  }

  /** Minimal VALID container fixtures with known dimensions — the
    * deterministic corpus the decode oracle runs on (and what a unit test
    * feeds the parsers). Each is a real header a strict reader accepts for
    * metadata purposes; lengths are FIXED per format so an SQL oracle can
    * state n_bytes in closed form. */
  object ImageFixtures {
    /** 33 bytes: signature + IHDR chunk (color type 2 = RGB, dummy CRC —
      * the parser reads structure, not checksums). */
    def png(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(33)
      out.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      out.putInt(13).put("IHDR".getBytes("US-ASCII"))
      out.putInt(w).putInt(h)
      out.put(8.toByte).put(2.toByte) // bit depth 8, color type 2 (RGB)
      out.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      out.putInt(0) // CRC placeholder
      out.array()
    }

    /** 41 bytes: SOI + APP0(JFIF) + SOF0(3 components) + EOI — the APP0
      * forces the parser's segment-skipping loop to do real work. */
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(41)
      out.put(0xff.toByte).put(0xd8.toByte) // SOI
      out.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort) // APP0 len 16
      out.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      out.put(1.toByte).put(1.toByte) // version 1.1
      out.put(0.toByte).putShort(1.toShort).putShort(1.toShort) // units, density
      out.put(0.toByte).put(0.toByte) // thumbnail 0×0
      out.put(0xff.toByte).put(0xc0.toByte).putShort(17.toShort) // SOF0 len 17
      out.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      (1 to 3).foreach { c => out.put(c.toByte).put(0x11.toByte).put(0.toByte) }
      out.put(0xff.toByte).put(0xd9.toByte) // EOI
      out.array()
    }

    /** 14 bytes: header + logical screen descriptor + trailer. */
    def gif(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(14)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("GIF89a".getBytes("US-ASCII"))
      out.putShort(w.toShort).putShort(h.toShort)
      out.put(0.toByte).put(0.toByte).put(0.toByte)
      out.put(0x3b.toByte) // trailer
      out.array()
    }

    /** 16 bytes that parse as NO known container. */
    def garbage(id: Long): Array[Byte] =
      s"garbage-payload-$id".getBytes("UTF-8").take(16)

    /** Canonical WAV header (44 bytes + `nSamples·blockAlign` zero data,
      * capped so fixtures stay tiny) with a LIST chunk spliced between
      * fmt and data so the chunk scan does real work. PCM 16-bit. */
    def wav(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
      val bits = 16
      val blockAlign = channels * bits / 8
      val dataSize = nSamples * blockAlign
      val listBody = 4 // "INFO"
      val riffSize = 4 + (8 + 16) + (8 + listBody) + (8 + dataSize)
      val out = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      out.putShort(1.toShort).putShort(channels.toShort) // PCM
      out.putInt(sampleRate).putInt(sampleRate * blockAlign)
      out.putShort(blockAlign.toShort).putShort(bits.toShort)
      out.put("LIST".getBytes("US-ASCII")).putInt(listBody)
      out.put("INFO".getBytes("US-ASCII"))
      out.put("data".getBytes("US-ASCII")).putInt(dataSize)
      out.array() // zero PCM frames follow the data header
    }

    /** MPEG Layer III stream: an ID3v2 tag of `id3Body` bytes, then
      * `nFrames` audio frames (zero payload) at the given bitrate /
      * sample-rate table indices. `version`: 0 = MPEG-1, 1 = MPEG-2,
      * 2 = MPEG-2.5 — MPEG-2/2.5 use the low-rate tables (half the v1
      * kbps, half/quarter the v1 rates) and 576-sample frames. Frame
      * length is the spec's floor(coef·bitrate/rate) (padding 0, coef
      * 144000 v1 / 72000 v2+), so total size is closed-form:
      * 10 + id3Body [+10 footer] + totalFrames·frameLen, where
      * totalFrames = nFrames + 1 when `vbr` (a leading audio-free frame
      * carrying a Xing header whose frames field = nFrames).
      * `footer` sets the ID3v2 footer flag and appends the 10-byte
      * footer the size field does not count. */
    def mp3(srIdx: Int, brIdx: Int, nFrames: Int, id3Body: Int,
        mono: Boolean, version: Int = 0, vbr: Boolean = false,
        footer: Boolean = false): Array[Byte] = {
      val srV1 = Array(44100, 48000, 32000)(srIdx)
      val sr = srV1 / (version match { case 0 => 1; case 1 => 2; case _ => 4 })
      val kbpsV1 = Array(96, 128, 192, 256)(brIdx)
      val kbps = if (version == 0) kbpsV1 else kbpsV1 / 2
      // table index of each kbps per version's bitrate table
      val brField =
        if (version == 0) Array(7, 9, 11, 13)(brIdx)
        else Array(6, 8, 10, 12)(brIdx) // 48/64/96/128 in the low-rate table
      val coef = if (version == 0) 144000 else 72000
      val frameLen = coef * kbps / sr
      val verBits = version match { case 0 => 3; case 1 => 2; case _ => 0 }
      val totalFrames = if (vbr) nFrames + 1 else nFrames
      val foot = if (footer) 10 else 0
      val out = java.nio.ByteBuffer.allocate(
        10 + id3Body + foot + totalFrames * frameLen)
      out.put("ID3".getBytes("US-ASCII")).put(4.toByte).put(0.toByte) // v2.4
      out.put((if (footer) 0x10 else 0).toByte) // flags (0x10 = footer)
      // syncsafe size (id3Body < 128 in fixtures, so only the low byte)
      out.put(0.toByte).put(0.toByte).put((id3Body >> 7).toByte)
        .put((id3Body & 0x7f).toByte)
      out.position(out.position() + id3Body + foot) // zero tag body + footer
      val hdr = Array[Byte](0xff.toByte,
        (0xe0 | (verBits << 3) | (1 << 1) | 1).toByte, // L3, no CRC
        ((brField << 4) | (srIdx << 2)).toByte, // padding 0
        (if (mono) 0xc0 else 0x00).toByte) // mode 3 = mono, 0 = stereo
      val base = 10 + id3Body + foot
      (0 until totalFrames).foreach { f =>
        out.position(base + f * frameLen)
        out.put(hdr)
      }
      if (vbr) {
        // Xing header in the first (audio-free) frame: right after the
        // side info, flags bit 0 set, frames = the nFrames audio frames
        val side =
          if (version == 0) { if (mono) 17 else 32 }
          else { if (mono) 9 else 17 }
        out.position(base + 4 + side)
        out.put("Xing".getBytes("US-ASCII")).putInt(1).putInt(nFrames)
      }
      out.array()
    }

    /** ISO-BMFF fixture: `ftyp` (16 B) + `moov` holding a v0 `mvhd`
      * (timescale, duration) and one `trak`/`tkhd` (16.16 width/height) —
      * 232 bytes total, every field at its spec offset. */
    def mp4(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(232)
      out.putInt(16).put("ftyp".getBytes("US-ASCII"))
      out.put("isom".getBytes("US-ASCII")).putInt(0)
      out.putInt(216).put("moov".getBytes("US-ASCII"))
      // mvhd v0: ver/flags, creation, modification, timescale, duration,
      // rate(1.0), volume(1.0)+reserved, reserved×2, matrix(9), predef(6),
      // next_track_id
      out.putInt(108).put("mvhd".getBytes("US-ASCII"))
      out.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(duration)
      out.putInt(0x00010000).putShort(0x0100.toShort).putShort(0.toShort)
      out.putInt(0).putInt(0)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(out.putInt)
      (0 until 6).foreach(_ => out.putInt(0))
      out.putInt(2)
      // trak > tkhd v0: ver/flags, creation, modification, track_id,
      // reserved, duration, reserved×2, layer, alt_group, volume, reserved,
      // matrix(9), width 16.16, height 16.16
      out.putInt(100).put("trak".getBytes("US-ASCII"))
      out.putInt(92).put("tkhd".getBytes("US-ASCII"))
      out.putInt(0x00000007).putInt(0).putInt(0).putInt(1).putInt(0)
      out.putInt(duration).putInt(0).putInt(0)
      out.putShort(0.toShort).putShort(0.toShort)
      out.putShort(0.toShort).putShort(0.toShort)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(out.putInt)
      out.putInt(w << 16).putInt(h << 16)
      out.array()
    }

    /** Deterministic per-id fixture: format cycles on id % 4 (3 = garbage),
      * dims are closed-form in id — the oracle restates these in SQL. */
    def payload(id: Long): Array[Byte] = {
      val w = (1L + math.floorMod(id * 7L, 640L)).toInt
      val h = (1L + math.floorMod(id * 13L, 480L)).toInt
      math.floorMod(id, 4L) match {
        case 0L => png(w, h)
        case 1L => jpeg(w, h)
        case 2L => gif(w, h)
        case _ => garbage(id)
      }
    }
  }

  /** [[decodeMeta]]'s sibling for the REAL image decode — same batched
    * mapPartitions plumbing, [[ImageMeta]] rows out. */
  def decodeImageMeta(
      df: DataFrame, idCol: String, payloadCol: String,
      decoder: ImageDecoder = HeaderParseDecoder,
      batchSize: Int = 64): Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decoder.decodeImages(g)))
  }

  /** Run a decoder over (id, payload) rows with per-partition batching —
    * the mapInPandas-shaped plumbing. Batch size bounds executor memory for
    * large payloads; at 100 TB, payload columns ride in their own parquet
    * row groups and this stage is map-only (no shuffle). */
  def decodeMeta(
      df: DataFrame, idCol: String, payloadCol: String,
      decoder: MediaDecoder, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decoder.decode(g)))
  }
}
