package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Multimodal.{HeaderParseDecoder => D, ImageFixtures => F}

/** The REAL image decode (round-15 directive #1): pure-Scala PNG/JPEG/GIF
  * header parsers. Verified three ways — against the deterministic fixtures
  * (closed-form dims), against REAL encoder output (the JDK's own
  * `javax.imageio` writers, so the parsers are proven on bytes a genuine
  * codec produced, not just on our own fixtures), and for totality (any
  * truncation/corruption → None, never a throw). */
class MultimodalSpec extends AnyFunSuite {

  test("fixture payloads parse back to their closed-form metadata") {
    assert(D.parseImage(F.png(640, 480)) == Some(("png", 640L, 480L, 3L)))
    assert(D.parseImage(F.jpeg(31, 7)) == Some(("jpeg", 31L, 7L, 3L)))
    assert(D.parseImage(F.gif(1, 1)) == Some(("gif", 1L, 1L, 3L)))
    assert(D.parseImage(F.garbage(42L)).isEmpty)
    // the per-id cycle the oracle query states in SQL
    Seq(0L, 1L, 2L, 3L, 400L, 401L, 402L, 403L).foreach { id =>
      val meta = D.decodeImages(Seq(id -> F.payload(id))).head
      val expectFmt = math.floorMod(id, 4L) match {
        case 0 => Some("png"); case 1 => Some("jpeg"); case 2 => Some("gif")
        case _ => None
      }
      assert(meta.format == expectFmt, s"id=$id")
      if (expectFmt.isDefined) {
        assert(meta.width.contains(1L + math.floorMod(id * 7L, 640L)))
        assert(meta.height.contains(1L + math.floorMod(id * 13L, 480L)))
        assert(meta.channels.contains(3L))
      } else assert(meta.width.isEmpty && meta.height.isEmpty && meta.channels.isEmpty)
    }
  }

  test("parsers accept REAL encoder output: javax.imageio PNG/JPEG/GIF " +
      "bytes round-trip their dimensions") {
    import java.awt.image.BufferedImage
    def encoded(fmt: String, w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no JDK $fmt writer")
      out.toByteArray
    }
    val png = D.parseImage(encoded("png", 23, 11, BufferedImage.TYPE_INT_RGB))
    assert(png.exists(m => m._1 == "png" && m._2 == 23L && m._3 == 11L && m._4 == 3L), png)
    // gray+alpha PNG → 2 channels (color type 4)
    val pngGa = D.parseImage(encoded("png", 5, 9, BufferedImage.TYPE_BYTE_GRAY))
    assert(pngGa.exists(m => m._1 == "png" && m._2 == 5L && m._3 == 9L), pngGa)
    val jpg = D.parseImage(encoded("jpg", 40, 25, BufferedImage.TYPE_INT_RGB))
    assert(jpg.exists(m => m._1 == "jpeg" && m._2 == 40L && m._3 == 25L && m._4 == 3L), jpg)
    val gif = D.parseImage(encoded("gif", 13, 6, BufferedImage.TYPE_INT_RGB))
    assert(gif.exists(m => m._1 == "gif" && m._2 == 13L && m._3 == 6L), gif)
  }

  test("totality: every truncation and byte-corruption of valid payloads " +
      "returns None or a value — never throws") {
    val samples = Seq(F.png(100, 50), F.jpeg(100, 50), F.gif(100, 50))
    samples.foreach { full =>
      (0 to full.length).foreach { n =>
        D.parseImage(full.take(n)) // must not throw
      }
      full.indices.foreach { i =>
        val corrupt = full.clone(); corrupt(i) = (corrupt(i) ^ 0x5a).toByte
        D.parseImage(corrupt) // must not throw
      }
    }
    assert(D.parseImage(Array.empty[Byte]).isEmpty)
    assert(D.decodeImages(Seq(1L -> Array.empty[Byte])).head.format.isEmpty)
  }

  test("JPEG marker scan: fill bytes before markers and a DHT segment " +
      "before SOF are skipped; EOI before SOF yields None") {
    val base = F.jpeg(300, 200)
    // splice fill 0xFF bytes + a DHT (C4) segment between APP0 and SOF0
    val app0End = 20 // SOI(2) + APP0 marker(2) + len 16
    val dht = Array(0xff, 0xff, 0xff, 0xc4, 0x00, 0x04, 0x00, 0x00).map(_.toByte)
    val spliced = base.take(app0End) ++ dht ++ base.drop(app0End)
    assert(D.parseJpeg(spliced) == Some(("jpeg", 300L, 200L, 3L)))
    val eoiOnly = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(D.parseJpeg(eoiOnly).isEmpty)
  }

  test("WAV parser: fixtures round-trip, REAL javax.sound.sampled encoder " +
      "output parses, truncations/corruptions never throw") {
    import graft.ops.Multimodal.WavParser
    assert(WavParser.parseWav(F.wav(44100, 2, 97)) == Some((44100L, 2L, 16L, 97L)))
    assert(WavParser.parseWav(F.wav(8000, 1, 1)) == Some((8000L, 1L, 16L, 1L)))
    assert(WavParser.parseWav(F.garbage(7L)).isEmpty)
    assert(WavParser.parseWav(F.png(4, 4)).isEmpty)
    // a REAL encoder's bytes: the JDK's own WAV writer
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val pcm = new Array[Byte](2 * 321) // 321 16-bit mono frames
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 321L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val real = WavParser.parseWav(out.toByteArray)
    assert(real == Some((16000L, 1L, 16L, 321L)), real)
    // totality
    val full = F.wav(22050, 2, 13)
    (0 to full.length).foreach(n => WavParser.parseWav(full.take(n)))
    full.indices.foreach { i =>
      val c = full.clone(); c(i) = (c(i) ^ 0x5a).toByte; WavParser.parseWav(c)
    }
  }

  test("MP3 parser: fixture streams round-trip (tables, frame tiling, ID3 " +
      "skip, channel mode), truncations/corruptions never throw") {
    import graft.ops.Multimodal.Mp3Parser
    // srIdx 0 = 44100, brIdx 1 = 128 kbps, 3 frames, 5-byte ID3 body, mono
    val m = Mp3Parser.parseMp3(F.mp3(0, 1, 3, 5, mono = true))
    assert(m == Some((44100L, 1L, 128L, 3L * 1152L)), m)
    // stereo at 32 kHz / 256 kbps, no ID3 body
    val st = Mp3Parser.parseMp3(F.mp3(2, 3, 1, 0, mono = false))
    assert(st == Some((32000L, 2L, 256L, 1152L)), st)
    // the fixture's closed-form byte size the oracle states in SQL
    assert(F.mp3(1, 2, 4, 9, mono = true).length ==
      10 + 9 + 4 * (144000 * 192 / 48000))
    // strictness: trailing garbage / desync rejected, not half-read
    // (parse the clean stream FIRST so the rejection assert isn't vacuous)
    val full = F.mp3(0, 0, 2, 0, mono = true)
    assert(Mp3Parser.parseMp3(full) == Some((44100L, 1L, 96L, 2L * 1152L)))
    assert(Mp3Parser.parseMp3(full ++ Array[Byte](0x41)).isEmpty)
    assert(Mp3Parser.parseMp3(F.garbage(3L)).isEmpty)
    assert(Mp3Parser.parseMp3(F.wav(8000, 1, 4)).isEmpty)
    // totality sweeps
    (0 to full.length).foreach(n => Mp3Parser.parseMp3(full.take(n)))
    full.indices.foreach { i =>
      val c = full.clone(); c(i) = (c(i) ^ 0x5a).toByte; Mp3Parser.parseMp3(c)
    }
  }

  test("MP3 parser: MPEG-2/2.5 tables (576-sample frames, 72000 coefficient)," +
      " Xing VBR cross-check, ID3v2 footer flag — round-18 directive #5") {
    import graft.ops.Multimodal.Mp3Parser
    // MPEG-2: halved rates/kbps, 576 samples/frame. srIdx 0 → 22050,
    // brIdx 1 → 64 kbps, 3 frames
    val v2 = Mp3Parser.parseMp3(F.mp3(0, 1, 3, 5, mono = true, version = 1))
    assert(v2 == Some((22050L, 1L, 64L, 3L * 576L)), v2)
    // MPEG-2.5: quartered rates. srIdx 2 → 8000, brIdx 3 → 128 kbps, stereo
    val v25 = Mp3Parser.parseMp3(F.mp3(2, 3, 2, 0, mono = false, version = 2))
    assert(v25 == Some((8000L, 2L, 128L, 2L * 576L)), v25)
    // per-version closed-form byte size (what the oracle states in SQL)
    assert(F.mp3(1, 2, 4, 9, mono = true, version = 1).length ==
      10 + 9 + 4 * (72000 * 96 / 24000))
    // Xing VBR: a leading audio-free header frame; n_samples comes from the
    // declared audio-frame count, which must match the tiling
    val vbr = F.mp3(0, 1, 3, 5, mono = true, vbr = true)
    assert(Mp3Parser.parseMp3(vbr) == Some((44100L, 1L, 128L, 3L * 1152L)))
    // VBR on an MPEG-2 stream (different side-info offset: 9 bytes mono)
    val vbr2 = Mp3Parser.parseMp3(F.mp3(1, 0, 4, 0, mono = true, version = 1, vbr = true))
    assert(vbr2 == Some((24000L, 1L, 48L, 4L * 576L)), vbr2)
    // stereo side-info offset (32 bytes for MPEG-1)
    val vbrSt = Mp3Parser.parseMp3(F.mp3(2, 2, 2, 3, mono = false, vbr = true))
    assert(vbrSt == Some((32000L, 2L, 192L, 2L * 1152L)), vbrSt)
    // a LYING Xing frame count (matching NEITHER the exclude-header nor the
    // include-header convention) is a desync → None
    val lying = F.mp3(0, 1, 3, 5, mono = true, vbr = true).clone()
    // frames field sits at 10+5 (id3) + 4 + 17 (mono v1 side) + 8, big-endian
    val fAt = 10 + 5 + 4 + 17 + 8
    lying(fAt + 3) = (lying(fAt + 3) + 2).toByte
    assert(Mp3Parser.parseMp3(lying).isEmpty)
    // include-header convention (round-18 ADVICE): an encoder that writes
    // TOTAL walked frames (audio + the Xing frame itself) is still
    // consistent; samples stay tiling-derived (3 audio frames)
    val inclHdr = F.mp3(0, 1, 3, 5, mono = true, vbr = true).clone()
    inclHdr(fAt + 3) = (inclHdr(fAt + 3) + 1).toByte // 3 → 4 = total walked
    assert(Mp3Parser.parseMp3(inclHdr) == Some((44100L, 1L, 128L, 3L * 1152L)))
    // a frames-field-LESS Xing/Info header (flags bit 0 clear — TOC-only,
    // the common CBR "Info" shape): the header frame is still audio-free,
    // so n_samples counts the walked frames MINUS it (round-18 review: the
    // detected-but-ignored tag used to add a phantom frame of samples)
    val tocOnly = F.mp3(0, 1, 3, 5, mono = true, vbr = true).clone()
    val flagsAt = 10 + 5 + 4 + 17 + 4 // tag at id3+4+side, flags 4 in
    java.util.Arrays.fill(tocOnly, flagsAt, flagsAt + 8, 0.toByte) // flags+frames → 0
    assert(Mp3Parser.parseMp3(tocOnly) == Some((44100L, 1L, 128L, 3L * 1152L)))
    // ID3v2 footer flag: 10 extra bytes after the tag body (ADVICE r17)
    val footered = F.mp3(0, 0, 2, 7, mono = true, footer = true)
    assert(Mp3Parser.parseMp3(footered) == Some((44100L, 1L, 96L, 2L * 1152L)))
    assert(footered.length == 10 + 7 + 10 + 2 * (144000 * 96 / 44100))
    // mixed versions across frames = desync → None
    val mixed = F.mp3(0, 1, 2, 0, mono = true) ++
      F.mp3(0, 1, 1, 0, mono = true, version = 1).drop(10)
    assert(Mp3Parser.parseMp3(mixed).isEmpty)
    // totality sweeps over the new shapes
    for (s <- Seq(vbr, footered, F.mp3(1, 1, 2, 0, mono = false, version = 2))) {
      (0 to s.length).foreach(n => Mp3Parser.parseMp3(s.take(n)))
      s.indices.foreach { i =>
        val c = s.clone(); c(i) = (c(i) ^ 0x5a).toByte; Mp3Parser.parseMp3(c)
      }
    }
  }

  test("MP3 parser: Xing payload reads are bounded by the FIRST FRAME, not " +
      "just the buffer (round-18 ADVICE) — a frames field that spills into " +
      "frame 2 is ignored (TOC-only), never read from the next frame's bytes") {
    import graft.ops.Multimodal.Mp3Parser
    // The smallest real Layer III frame: MPEG-2 mono, 8 kbps @ 24 kHz →
    // frameLen = 72000·8/24000 = 24 bytes. Side info = 9, so the Xing tag
    // sits at offset 13..17, flags at 17..21 (fits), and the frames field
    // at 21..25 CROSSES the frame boundary at 24. Hand-built: the fixture
    // builder's bitrate menu has no 8 kbps entry.
    val frameLen = 24
    val hdr = Array[Byte](0xff.toByte,
      (0xe0 | (2 << 3) | (1 << 1) | 1).toByte, // MPEG-2 (verBits 2), L3
      ((1 << 4) | (1 << 2)).toByte, // brIdx 1 = 8 kbps, srIdx 1 = 24000
      0xc0.toByte) // mono
    val b = new Array[Byte](3 * frameLen) // header frame + 2 audio frames
    Seq(0, 1, 2).foreach(f => hdr.copyToArray(b, f * frameLen))
    "Xing".getBytes("US-ASCII").copyToArray(b, 13)
    b(20) = 1 // flags = 1 (frames-field-present bit), big-endian at 17..21
    // bytes 21..23 stay 0; byte 24 is frame 2's 0xff sync — an unbounded
    // read would decode frames = 0x000000ff = 255 and reject a valid file
    val got = Mp3Parser.parseMp3(b)
    assert(got == Some((24000L, 1L, 8L, 2L * 576L)), got)
    // same stream with the tag (not just its payload) past the frame end is
    // not a VBR header at all: tagIs already bounds the 4 tag bytes
    val noTag = b.clone()
    java.util.Arrays.fill(noTag, 13, 21, 0.toByte)
    assert(Mp3Parser.parseMp3(noTag) == Some((24000L, 1L, 8L, 3L * 576L)))
  }

  test("MP4 parser: nested size-0 box rejected (size 0 is last-top-level-" +
      "box-only per spec — ADVICE r17), top-level size-0 still honored") {
    import graft.ops.Multimodal.Mp4Parser
    val base = F.mp4(320, 240, 1000, 5000)
    // top-level size-0 moov (extends to end of file): still parses
    val top = base.clone()
    java.nio.ByteBuffer.wrap(top).putInt(16, 0) // moov size → 0
    assert(Mp4Parser.parseMp4(top) == Some((320L, 240L, 1000L, 5000L)))
    // NESTED size-0 (the trak inside moov): must reject, not swallow the span
    val nested = base.clone()
    java.nio.ByteBuffer.wrap(nested).putInt(132, 0) // trak size → 0
    assert(Mp4Parser.parseMp4(nested).isEmpty)
  }

  test("MP4 parser: fixture boxes round-trip (mvhd timescale/duration, tkhd " +
      "16.16 dims), largesize + v1 handled, truncations/corruptions never " +
      "throw") {
    import graft.ops.Multimodal.Mp4Parser
    val m = Mp4Parser.parseMp4(F.mp4(1920, 1080, 600, 90000))
    assert(m == Some((1920L, 1080L, 600L, 90000L)), m)
    assert(F.mp4(64, 64, 1000, 1).length == 232)
    // rewrite moov as a largesize box: size=1 + 64-bit size, payload shifted
    val base = F.mp4(320, 240, 1000, 5000)
    val moovPayload = base.slice(24, 232) // after the 8-byte moov header
    val big = java.nio.ByteBuffer.allocate(16 + 16 + moovPayload.length)
    big.put(base.take(16)) // ftyp
    big.putInt(1).put("moov".getBytes("US-ASCII"))
    big.putLong(16L + moovPayload.length).put(moovPayload)
    assert(Mp4Parser.parseMp4(big.array()) == Some((320L, 240L, 1000L, 5000L)))
    // v1 mvhd: u64 creation/modification times, u32 timescale at +20,
    // u64 duration at +24 — rebuild moov with a v1 mvhd + the base trak
    val trak = base.slice(132, 232) // the 100-byte trak box
    val v1mvhd = java.nio.ByteBuffer.allocate(40)
    v1mvhd.putInt(40).put("mvhd".getBytes("US-ASCII"))
    v1mvhd.putInt(0x01000000) // version 1
    v1mvhd.putLong(0L).putLong(0L) // creation, modification (u64)
    v1mvhd.putInt(90000).putLong(123456789L)
    val v1 = java.nio.ByteBuffer.allocate(16 + 8 + 40 + trak.length)
    v1.put(base.take(16))
    v1.putInt(8 + 40 + trak.length).put("moov".getBytes("US-ASCII"))
    v1.put(v1mvhd.array()).put(trak)
    assert(Mp4Parser.parseMp4(v1.array()) ==
      Some((320L, 240L, 90000L, 123456789L)))
    // audio-trak-first: a 0×0-dims trak BEFORE the video trak (the common
    // soun-then-vide muxer order) must not null out the decode — the scan
    // takes the first trak with nonzero dimensions
    val vidTrak = base.slice(132, 232)
    val audTrak = vidTrak.clone()
    java.util.Arrays.fill(audTrak, 92, 100, 0.toByte) // zero the 16.16 dims
    val multi = java.nio.ByteBuffer.allocate(16 + 8 + 108 + 200)
    multi.put(base.take(16))
    multi.putInt(8 + 108 + 200).put("moov".getBytes("US-ASCII"))
    multi.put(base.slice(24, 132)) // the 108-byte mvhd
    multi.put(audTrak).put(vidTrak)
    assert(Mp4Parser.parseMp4(multi.array()) == Some((320L, 240L, 1000L, 5000L)))
    // audio-only (no dimensioned trak at all): None — this is the VIDEO face
    val audioOnly = java.nio.ByteBuffer.allocate(16 + 8 + 108 + 100)
    audioOnly.put(base.take(16))
    audioOnly.putInt(8 + 108 + 100).put("moov".getBytes("US-ASCII"))
    audioOnly.put(base.slice(24, 132)).put(audTrak)
    assert(Mp4Parser.parseMp4(audioOnly.array()).isEmpty)
    assert(Mp4Parser.parseMp4(F.garbage(11L)).isEmpty)
    assert(Mp4Parser.parseMp4(F.png(4, 4)).isEmpty)
    assert(Mp4Parser.parseMp4(F.mp3(0, 0, 1, 0, mono = true)).isEmpty)
    (0 to base.length).foreach(n => Mp4Parser.parseMp4(base.take(n)))
    base.indices.foreach { i =>
      val c = base.clone(); c(i) = (c(i) ^ 0x5a).toByte; Mp4Parser.parseMp4(c)
    }
  }

  test("distributed decode plumbing: batched mapPartitions over a binary " +
      "column yields one ImageMeta row per payload") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (0L until 64L).map(id => (id, F.payload(id))).toDF("doc_id", "payload")
    val got = Multimodal.decodeImageMeta(df, "doc_id", "payload", batchSize = 7)
      .collect().sortBy(_.doc_id)
    assert(got.length == 64)
    assert(got.count(_.format.contains("png")) == 16)
    assert(got.count(_.format.isEmpty) == 16)
    got.filter(_.format.contains("gif")).foreach { m =>
      assert(m.width.contains(1L + math.floorMod(m.doc_id * 7L, 640L)))
    }
  }

  test("audio/video quality gate over truncated and corrupt payloads " +
      "(round-18 directive #5): never throws, corrupt rows never survive, " +
      "a clean passing pair does") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // id 0: clean pair passing all floors (44.1 kHz / 100 samples;
    // 1280×720, 12000/600 = 20 s). ids 1..40: every truncation of the
    // clean payloads. ids 41..60: single-byte corruptions. id 61: clean
    // decodes that FAIL the floors (8 kHz audio, 320×200 2 s video).
    val wavOk = F.wav(44100, 1, 100)
    val mp4Ok = F.mp4(1280, 720, 600, 12000)
    def stripe(base: Array[Byte], i: Int): Array[Byte] =
      if (i <= 40) base.take(math.max(0, base.length * (i - 1) / 40 - 1))
      else { val c = base.clone(); val p = (i * 31) % c.length
        c(p) = (c(p) ^ 0x5a).toByte; c }
    val rows = ((0L, wavOk, mp4Ok) +:
      (1 to 60).map(i => (i.toLong, stripe(wavOk, i), stripe(mp4Ok, i)))) :+
      ((61L, F.wav(8000, 1, 100), F.mp4(320, 200, 600, 1200)))
    val df = rows.toDF("doc_id", "aud", "vid")
    val audPass = Multimodal.decodeAudioMeta(df, "doc_id", "aud").toDF()
      .filter(col("format").isNotNull &&
        col("sample_rate") >= 16000 && col("n_samples") >= 24)
      .select("doc_id")
    val vidPass = Multimodal.decodeVideoMeta(df, "doc_id", "vid").toDF()
      .filter(col("format").isNotNull &&
        col("width") >= 640 && col("height") >= 360 &&
        col("duration").cast("double") / col("timescale") >= 10.0)
      .select("doc_id")
    val survivors = audPass.join(vidPass, Seq("doc_id"))
      .as[Long].collect().sorted.toSeq
    // the clean passing pair survives; nothing truncated/corrupt may —
    // a corruption that happens to leave both decodes AND floors intact
    // would be caught here as a fixture bug, not waved through
    assert(survivors.head == 0L, survivors)
    assert(!survivors.contains(61L), "floor-failing pair must be gated out")
    survivors.filter(id => id >= 1 && id <= 40).foreach { id =>
      fail(s"truncated payload pair $id survived the gate")
    }
  }
}
