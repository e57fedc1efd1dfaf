package graft.operators

import graft.SparkSpec

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): Array[Byte] =
    Multimodal.Fixtures.bytes(name)

  test("parseWavHeader reads the committed PCM fixtures") {
    // (rate, channels, bits, dataBytes) straight from the RIFF walk
    assert(Media.parseWavHeader(fixture("square_8k_mono.wav"))
      .contains((8000, 1, 16, 1600)))
    assert(Media.parseWavHeader(fixture("ramp_stereo.wav"))
      .contains((4000, 2, 16, 400)))
    assert(Media.parseWavHeader(fixture("silence_441_mono.wav"))
      .contains((44100, 1, 16, 100)))
    assert(Media.parseWavHeader("not audio".getBytes).isEmpty)
    assert(Media.parseWavHeader(Array.emptyByteArray).isEmpty)
  }

  test("decodeAudioStats: REAL JDK decode matches the hand-derived stats") {
    // every constant is derivable by hand from the generator's sample
    // formulas (tools/gen_image_fixtures.py) — decoder-independent
    val sq = Media.decodeAudioStats(1L, fixture("square_8k_mono.wav"))
    assert(sq.sample_rate == 8000 && sq.channels == 1 && sq.n_frames == 800)
    assert(sq.duration_ms == 100)
    assert(sq.rms == 8192.0, "every |sample| is 8192")
    assert(sq.zero_crossings == 199, "sign flips at i = 4, 8, …, 796")
    assert(sq.peak == 8192)

    val ramp = Media.decodeAudioStats(2L, fixture("ramp_stereo.wav"))
    assert(ramp.sample_rate == 4000 && ramp.channels == 2 &&
      ramp.n_frames == 100 && ramp.duration_ms == 25)
    // sumsq = 33,330,000 (ch0 ramp) + 100,000,000 (ch1 const 1000)
    // over 200 samples -> sqrt(666650) = 816.48637…, 4-dp 816.4864
    assert(ramp.rms == 816.4864)
    assert(ramp.zero_crossings == 1, "ch0 crosses once; ch1 never")
    assert(ramp.peak == 1000)

    val sil = Media.decodeAudioStats(3L, fixture("silence_441_mono.wav"))
    assert(sil.rms == 0.0 && sil.zero_crossings == 0 && sil.peak == 0)
    assert(sil.duration_ms == 1, "floor(50 * 1000 / 44100)")

    // header pass and decode pass agree on the format fields
    Media.Fixtures.audio.foreach { n =>
      val hdr = Media.parseWavHeader(fixture(n)).get
      val dec = Media.decodeAudioStats(0L, fixture(n))
      assert(hdr._1 == dec.sample_rate && hdr._2 == dec.channels &&
        hdr._3 == dec.bits, n)
      assert(hdr._4 / (2 * hdr._2) == dec.n_frames, n)
    }
  }

  test("decodeAudioStats refuses non-audio and non-PCM payloads loudly") {
    intercept[IllegalArgumentException] {
      Media.decodeAudioStats(1L, "junk junk junk".getBytes)
    }
    intercept[IllegalArgumentException] {
      Media.decodeAudioStats(2L, Array.emptyByteArray)
    }
    // an image is not audio
    intercept[IllegalArgumentException] {
      Media.decodeAudioStats(3L, fixture("rgb_4x3.bmp"))
    }
  }

  test("WAV fuzz: independent encoder round-trips through the JDK decode") {
    // the encoder below writes RIFF bytes straight from the spec and the
    // REFERENCE stats come from the original int array — both fully
    // independent of the code under test
    val rnd = new scala.util.Random(20260816L)
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    def wav(rate: Int, ch: Int, samples: Array[Short]): Array[Byte] = {
      val data = samples.flatMap(s => le16(s.toInt & 0xffff))
      val block = ch * 2
      val fmt = le16(1) ++ le16(ch) ++ le32(rate) ++ le32(rate * block) ++
        le16(block) ++ le16(16)
      val body = "WAVE".getBytes ++ "fmt ".getBytes ++ le32(fmt.length) ++
        fmt ++ "data".getBytes ++ le32(data.length) ++ data
      "RIFF".getBytes ++ le32(body.length) ++ body
    }
    (1 to 200).foreach { i =>
      val ch = 1 + rnd.nextInt(3)
      val rate = 1000 + rnd.nextInt(48000)
      val frames = 1 + rnd.nextInt(50)
      val samples = Array.fill[Short]((frames * ch).toInt)(
        rnd.nextInt(65536).toShort)
      val got = Media.decodeAudioStats(i.toLong, wav(rate, ch, samples))
      // reference stats over the original ints
      var sumSq = 0L; var peak = 0; var crossings = 0L
      val last = new Array[Int](ch)
      samples.zipWithIndex.foreach { case (s, j) =>
        sumSq += s.toLong * s
        peak = math.max(peak, math.abs(s.toInt))
        if (s != 0) {
          val c = j % ch
          val sign = if (s > 0) 1 else -1
          if (last(c) != 0 && last(c) != sign) crossings += 1
          last(c) = sign
        }
      }
      val rms = math.round(
        math.sqrt(sumSq.toDouble / samples.length) * 10000).toDouble / 10000
      assert(got.sample_rate == rate && got.channels == ch &&
        got.n_frames == frames, s"trial $i format")
      assert(got.rms == rms && got.peak == peak &&
        got.zero_crossings == crossings, s"trial $i stats")
      // truncating inside the data chunk must refuse (RIFF sizes no
      // longer match), never fabricate
      val full = wav(rate, ch, samples)
      val cut = full.take(12 + rnd.nextInt(full.length - 12))
      val r = Media.parseWavHeader(cut)
      assert(r.isEmpty || r.contains((rate, ch, 16, frames * ch * 2)),
        s"trial $i prefix")
    }
  }

  test("adversarial payloads refuse with None, never crash (overflow guards)") {
    def le32b(v: Long) = Array(v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    // WAV: first chunk declares a near-Int.MaxValue size — the naive
    // 'i + 8 + size' wraps negative and indexed out of bounds pre-fix
    val evilWav = "RIFF".getBytes ++ le32b(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32b(0x7ffffff0L) ++ Array.fill(16)(0.toByte)
    assert(Media.parseWavHeader(evilWav).isEmpty)
    // TIFF: IFD offset near Int.MaxValue — 'ifd + 2' wrapped pre-fix
    val evilTiff = Array[Byte]('I', 'I', 42, 0) ++ le32b(0x7ffffffeL) ++
      Array.fill(16)(0.toByte)
    assert(Multimodal.HeaderCodec.parseDims(evilTiff).isEmpty)
    // BMP CORE header with zero dims must refuse, not report (0, 0, 3)
    val zeroCore = "BM".getBytes ++ le32b(26) ++ le32b(0) ++ le32b(26) ++
      le32b(12) ++ Array[Byte](0, 0, 0, 0) ++
      Array[Byte](1, 0, 24, 0) ++ Array.fill(8)(0.toByte)
    assert(Multimodal.HeaderCodec.parseDims(zeroCore).isEmpty)
    // BMP INFO height 0x80000000: abs(Int.MinValue) == Int.MinValue —
    // must refuse, not return a negative height
    val minHeight = "BM".getBytes ++ le32b(54) ++ le32b(0) ++ le32b(54) ++
      le32b(40) ++ le32b(10) ++ le32b(0x80000000L) ++
      Array[Byte](1, 0, 24, 0) ++ Array.fill(20)(0.toByte)
    assert(Multimodal.HeaderCodec.parseDims(minHeight).isEmpty)
  }

  test("parseMp4Header reads the committed ISO-BMFF fixtures") {
    assert(Media.parseMp4Header(fixture("clip_640x360.mp4"))
      .contains((640, 360, 7500L, 1)))
    assert(Media.parseMp4Header(fixture("clip_2trak.mp4"))
      .contains((320, 240, 2000L, 2)))
    assert(Media.parseMp4Header("not a video".getBytes).isEmpty)
    assert(Media.parseMp4Header(Array.emptyByteArray).isEmpty)
    val m = Media.decodeVideoMeta(5L, fixture("clip_640x360.mp4"))
    assert(m.doc_id == 5L && m.width == 640 && m.height == 360 &&
      m.duration_ms == 7500L && m.n_tracks == 1)
    intercept[IllegalArgumentException] {
      Media.decodeVideoMeta(6L, fixture("square_8k_mono.wav"))
    }
  }

  test("MP4 fuzz: spec-built moov/mvhd/tkhd round-trip + truncation contract") {
    val rnd = new scala.util.Random(20260817L)
    def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes ++ payload
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def mp4(w: Int, h: Int, timescale: Long, duration: Long,
            nTraks: Int, v1: Boolean): Array[Byte] = {
      // version 1 widens ctime/mtime/duration to 64 bits in BOTH mvhd
      // and tkhd (a +12 shift before tkhd's width, not +8 — the trap
      // the r14 review caught)
      val mvhd =
        if (v1) box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++
          be64(0) ++ be32(timescale) ++ be64(duration) ++
          Array.fill(80)(0.toByte))
        else box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
          be32(0) ++ be32(timescale) ++ be32(duration) ++
          Array.fill(80)(0.toByte))
      val traks = (1 to nTraks).flatMap { i =>
        val tkhd =
          if (v1) Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
            be32(i.toLong) ++ be32(0) ++ be64(duration) ++
            Array.fill(52)(0.toByte) ++
            be32(w.toLong << 16) ++ be32(h.toLong << 16)
          else Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
            be32(i.toLong) ++ be32(0) ++ be32(duration) ++
            Array.fill(52)(0.toByte) ++
            be32(w.toLong << 16) ++ be32(h.toLong << 16)
        box("trak", box("tkhd", tkhd))
      }.toArray
      box("ftyp", "isom".getBytes ++ be32(512)) ++
        box("moov", mvhd ++ traks)
    }
    (1 to 200).foreach { i =>
      val w = 1 + rnd.nextInt(8192); val h = 1 + rnd.nextInt(8192)
      val ts = 1L + rnd.nextInt(100000)
      val dur = rnd.nextInt(1000000).toLong
      val traks = 1 + rnd.nextInt(3)
      val v1 = rnd.nextBoolean()
      val want = (w, h, dur * 1000L / ts, traks)
      assert(Media.parseMp4Header(mp4(w, h, ts, dur, traks, v1))
        .contains(want), s"trial $i v1=$v1")
      val full = mp4(w, h, ts, dur, traks, v1)
      val cut = full.take(2 + rnd.nextInt(full.length - 2))
      val got = Media.parseMp4Header(cut)
      assert(got.isEmpty || got.contains(want), s"trial $i prefix")
    }
  }

  test("MP4 largesize (size==1) and to-EOF (size==0) boxes parse; crafted ones refuse") {
    def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes ++ payload
    val moovFile = fixture("clip_640x360.mp4")
    val want = (640, 360, 7500L, 1)
    // the real-world layout: a large mdat BEFORE moov, length carried as
    // a 64-bit largesize (size field == 1) — pre-fix this refused the
    // whole file even though moov is perfectly parseable
    val payload = Array.fill(64)(0x55.toByte)
    val largeMdat = be32(1L) ++ "mdat".getBytes ++
      be64(16L + payload.length) ++ payload
    assert(Media.parseMp4Header(largeMdat ++ moovFile).contains(want))
    // size==0: the final box extends to EOF
    val eofMdat = be32(0L) ++ "mdat".getBytes ++ payload
    assert(Media.parseMp4Header(moovFile ++ eofMdat).contains(want))
    // crafted largesize: shorter than its own 16-byte header, or past EOF
    val shortLs = be32(1L) ++ "mdat".getBytes ++ be64(8L)
    assert(Media.parseMp4Header(shortLs ++ moovFile).isEmpty)
    val pastEof = be32(1L) ++ "mdat".getBytes ++ be64(1L << 40)
    assert(Media.parseMp4Header(pastEof ++ moovFile).isEmpty)
    // truncated largesize header (8 bytes of a 16-byte header)
    assert(Media.parseMp4Header(moovFile ++ be32(1L) ++ "mdat".getBytes)
      .isEmpty)
    // a size==0 moov CONTAINER also parses (extends to EOF)
    val mvhdAndTrak = {
      // strip the committed file's ftyp, reuse its moov payload
      var off = 0
      var moovPayload: Array[Byte] = null
      while (moovPayload == null) {
        val sz = ((moovFile(off) & 0xff) << 24) |
          ((moovFile(off + 1) & 0xff) << 16) |
          ((moovFile(off + 2) & 0xff) << 8) | (moovFile(off + 3) & 0xff)
        val typ = new String(moovFile.slice(off + 4, off + 8), "ISO-8859-1")
        if (typ == "moov") moovPayload = moovFile.slice(off + 8, off + sz)
        else off += sz
      }
      moovPayload
    }
    assert(Media.parseMp4Header(
      box("ftyp", "isom".getBytes) ++
        (be32(0L) ++ "moov".getBytes ++ mvhdAndTrak)).contains(want))
  }

  test("TIFF entry with count != 1 on a dims tag refuses (offset-as-value trap)") {
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    def le32(v: Long) = Array(v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    def entry(tag: Int, typ: Int, count: Long, value: Long) =
      le16(tag) ++ le16(typ) ++ le32(count) ++ le32(value)
    def tiff(entries: Array[Byte], n: Int) =
      Array[Byte]('I', 'I', 42, 0) ++ le32(8L) ++ le16(n) ++ entries ++
        le32(0L)
    // conforming: count==1 everywhere → parses
    val good = tiff(entry(256, 3, 1, 6) ++ entry(257, 3, 1, 2) ++
      entry(277, 3, 1, 3), 3)
    assert(Multimodal.HeaderCodec.parseDims(good).contains((6, 2, 3)))
    // crafted: ImageWidth with count=2 stores an OFFSET in the value
    // field — reading it as the width would fabricate dims (here 9999)
    val evil = tiff(entry(256, 3, 2, 9999) ++ entry(257, 3, 1, 2) ++
      entry(277, 3, 1, 3), 3)
    assert(Multimodal.HeaderCodec.parseDims(evil).isEmpty)
    // count=0 is equally malformed
    val zero = tiff(entry(256, 3, 1, 6) ++ entry(257, 3, 0, 2), 2)
    assert(Multimodal.HeaderCodec.parseDims(zero).isEmpty)
    // the committed fixture (count==1 on every dims tag) still parses
    assert(Multimodal.HeaderCodec.parseDims(fixture("rgb_6x2.tif"))
      .contains((6, 2, 3)))
  }

  test("parseMp4Tracks reads the sample-table fixture; absent boxes are NULL") {
    val got = Media.parseMp4Tracks(fixture("clip_stbl.mp4"))
    assert(got.contains(Seq(
      Media.Mp4Track(Some(1), Some("vide"), Some("avc1"), Some(320), Some(180),
        Some(48L), Some(3L)),
      Media.Mp4Track(Some(2), Some("soun"), Some("mp4a"), None, None,
        Some(96L), Some(4L)))))
    // tkhd-only clip: stbl fields honestly absent, track ids present
    val bare = Media.parseMp4Tracks(fixture("clip_2trak.mp4"))
    assert(bare.contains(Seq(
      Media.Mp4Track(Some(1), None, None, None, None, None, None),
      Media.Mp4Track(Some(2), None, None, None, None, None, None))))
    // the header walk still reads the new fixture (mvhd v0 constants)
    assert(Media.parseMp4Header(fixture("clip_stbl.mp4"))
      .contains((320, 180, 4000L, 2)))
    // not-a-video refuses
    assert(Media.parseMp4Tracks("nope".getBytes).isEmpty)
    assert(Media.parseMp4Tracks(fixture("square_8k_mono.wav")).isEmpty)
  }

  test("parseMp4Tracks truncation/crafted contract: refuse or agree, never fabricate") {
    val full = fixture("clip_stbl.mp4")
    val want = Media.parseMp4Tracks(full)
    val rnd = new scala.util.Random(20260816L)
    (1 to 300).foreach { i =>
      val cut = full.take(2 + rnd.nextInt(full.length - 2))
      val got = Media.parseMp4Tracks(cut)
      assert(got.isEmpty || got == want, s"trial $i")
    }
    // crafted stsd: first sample entry's size runs past the stsd box —
    // codec must stay unreported (no fourcc read from a truncated
    // entry), everything else intact
    val idx = {
      // locate 'stsd' fourcc
      val pat = "stsd".getBytes
      (0 until full.length - 4).find(j => full.slice(j, j + 4)
        .sameElements(pat)).get
    }
    val evil = full.clone()
    // entry size field sits at stsd payload + 8 = fourcc + 4 (ver/flags)
    // + 4 (entry_count); make it enormous
    val es = idx + 4 + 4 + 4
    evil(es) = 0x7f.toByte; evil(es + 1) = 0xff.toByte
    val got = Media.parseMp4Tracks(evil)
    assert(got.isDefined && got.get.head.codec.isEmpty &&
      got.get.head.width.isEmpty)
  }

  test("parseMp4Tracks reads stss/ctts; sync-less tracks stay NULL") {
    val got = Media.parseMp4Tracks(fixture("clip_sync.mp4"))
    assert(got.isDefined, "clip_sync.mp4 must parse")
    val Seq(vide, soun) = got.get
    assert(vide.handler.contains("vide"))
    assert(vide.sync_samples.contains(Seq(1L, 13L, 25L, 37L)))
    assert(vide.n_ctts_entries.contains(2L))
    assert(vide.max_ctts_offset.contains(512L))
    // the audio track carries neither box: honest NULLs, not zeros
    assert(soun.sync_samples.isEmpty && soun.n_ctts_entries.isEmpty &&
      soun.max_ctts_offset.isEmpty)
    // stss-less stbl fixture: keyframe fields NULL everywhere
    val stbl = Media.parseMp4Tracks(fixture("clip_stbl.mp4")).get
    assert(stbl.forall(t => t.sync_samples.isEmpty &&
      t.n_ctts_entries.isEmpty))
  }

  test("stss/ctts truncation: entry counts overrunning the box refuse the file") {
    val full = fixture("clip_sync.mp4")
    def patchCount(fourcc: String): Array[Byte] = {
      val pat = fourcc.getBytes
      val idx = (0 until full.length - 4).find(j => full.slice(j, j + 4)
        .sameElements(pat)).get
      val evil = full.clone()
      // entry_count at fourcc + 4 (ver/flags) + 0 -> bytes idx+8..11
      evil(idx + 8) = 0x7f.toByte
      evil
    }
    assert(Media.parseMp4Tracks(patchCount("stss")).isEmpty,
      "stss count past the box must refuse, not fabricate")
    assert(Media.parseMp4Tracks(patchCount("ctts")).isEmpty,
      "ctts count past the box must refuse, not fabricate")
    // random truncations: refuse or agree, never fabricate
    val want = Media.parseMp4Tracks(full)
    val rnd = new scala.util.Random(20260817L)
    (1 to 200).foreach { i =>
      val cut = full.take(2 + rnd.nextInt(full.length - 2))
      val got = Media.parseMp4Tracks(cut)
      assert(got.isEmpty || got == want, s"trial $i")
    }
  }

  test("keyframeSampleFrames: stss positions, all-sync fallback, payload-truncation drop") {
    val df = Media.Fixtures.df(spark, Media.Fixtures.videoSync)
    val out = Media.keyframeSampleFrames(df)
      .collect().map(r => (r.getString(1), r.getLong(2),
        r.getAs[Array[Byte]](3))).toSeq
    val sync = out.filter(_._1 == "clip_sync.mp4")
    assert(sync.map(_._2).sorted == Seq(0L, 12L, 24L, 36L),
      s"stss-aligned indices: ${sync.map(_._2)}")
    // frame bytes are the literal payload slice
    val payload = fixture("clip_sync.mp4")
    sync.foreach { case (_, i, fr) =>
      assert(java.util.Arrays.equals(fr,
        java.util.Arrays.copyOfRange(payload, i.toInt * 32,
          i.toInt * 32 + 32)))
    }
    // stss-less fixture: stride-4 fallback over 48 samples, truncated to
    // the frames that FIT its 778 bytes (idx <= 23)
    val stbl = out.filter(_._1 == "clip_stbl.mp4")
    assert(stbl.map(_._2).sorted == Seq(0L, 4L, 8L, 12L, 16L, 20L),
      s"fallback indices: ${stbl.map(_._2)}")
    // refusal contracts: no video track / unparseable payload
    import spark.implicits._
    val audioOnly = Seq((9L, "square_8k_mono.wav",
      fixture("square_8k_mono.wav"))).toDF("media_key", "name", "media")
    val e = intercept[org.apache.spark.SparkException] {
      Media.keyframeSampleFrames(audioOnly).collect()
    }
    assert(e.getMessage.contains("ISO-BMFF") ||
      Option(e.getCause).exists(_.getMessage.contains("ISO-BMFF")))
  }

  test("audio/video reports join real decoded stats to row counts") {
    val rows = Seq.tabulate(10)(i => Tuple1(i.toLong % 3)).toDF("media_key")
    val a = Media.audioStatsReport(rows, "media_key",
        Media.Fixtures.df(spark, Media.Fixtures.audio))
      .collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(a.size == 3)
    assert(a("ramp_stereo.wav").getAs[Long]("n_docs") == 4L)
    assert(a("square_8k_mono.wav").getAs[Double]("rms") == 8192.0)
    val vrows = Seq.tabulate(5)(i => Tuple1(i.toLong % 2)).toDF("media_key")
    val v = Media.videoHeaderReport(vrows, "media_key",
        Media.Fixtures.df(spark, Media.Fixtures.video))
      .collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(v("clip_2trak.mp4").getAs[Long]("n_docs") == 3L)
    assert(v("clip_640x360.mp4").getAs[Int]("width") == 640)
  }
}
