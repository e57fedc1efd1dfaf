package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio / video columns for a multimodal corpus, same design as the
  * image path in [[Multimodal]]: payloads are opaque `binary` columns;
  * a pure-JVM HEADER pass extracts the metadata that prunes a 100 TB
  * corpus without touching samples (sample rate / duration / dims
  * filters), and a REAL decode stage computes content statistics — for
  * audio via the JDK's own `javax.sound.sampled` (WAV/AIFF/AU PCM
  * readers ship with JDK 17; no external library), for video as an
  * ISO-BMFF (MP4/MOV) box walk (the JDK has no video decoder — frame
  * payload work stays behind [[Multimodal.sampleFrames]]-style
  * plumbing). Undecodable payloads throw `IllegalArgumentException`,
  * never fabricate stats — the [[Multimodal.HeaderCodec]] contract. */
object Media {

  // ---- audio ------------------------------------------------------------

  /** Decoded-PCM content statistics. `rms` is over ALL samples of all
    * channels (4-dp rounded); `zero_crossings` sums per-channel sign
    * changes (a crossing is counted when a nonzero sample's sign differs
    * from the channel's LAST NONZERO sample — silence between swings
    * neither adds nor hides a crossing); `peak` is max |sample|. */
  final case class AudioStats(doc_id: Long, sample_rate: Int, channels: Int,
                              bits: Int, n_frames: Long, duration_ms: Long,
                              rms: Double, zero_crossings: Long, peak: Int)

  /** Pure-JVM WAV header parse: (sampleRate, channels, bitsPerSample,
    * dataBytes) from the RIFF/WAVE chunk walk, or None. Only PCM
    * (format tag 1) is reported — compressed WAV flavors fail the
    * header pass rather than promising samples the decode stage reads
    * differently. */
  def parseWavHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val n = b.length
    if (n < 12 || !b.slice(0, 4).sameElements("RIFF".getBytes) ||
        !b.slice(8, 12).sameElements("WAVE".getBytes)) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var dataBytes = -1
    while (i + 8 <= n && (fmt.isEmpty || dataBytes < 0)) {
      val id = new String(b.slice(i, i + 4), "ISO-8859-1")
      val size = le32(i + 4)
      // LONG arithmetic: a crafted chunk size near Int.MaxValue would
      // wrap 'i + 8 + size' negative, slip past the bounds check, and
      // index out of bounds on the next iteration — refuse, don't crash
      if (size < 0 || i.toLong + 8 + size > n) return None
      if (id == "fmt " && size >= 16) {
        val tag = le16(i + 8)
        if (tag != 1) return None // PCM only
        fmt = Some((le32(i + 12), le16(i + 10), le16(i + 22)))
      } else if (id == "data") dataBytes = size
      i += 8 + size + (size & 1) // chunks pad to even
    }
    fmt.collect { case (rate, ch, bits)
        if rate > 0 && ch > 0 && bits > 0 && dataBytes >= 0 =>
      (rate, ch, bits, dataBytes)
    }
  }

  /** REAL PCM decode via `javax.sound.sampled`: the JDK reader validates
    * and exposes the stream; stats are integer arithmetic over the
    * decoded 16-bit samples, so the values anchor in an oracle. Refuses
    * loudly on anything the JDK cannot read or that is not 16-bit
    * signed little-endian PCM. */
  def decodeAudioStats(id: Long, bytes: Array[Byte]): AudioStats = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"doc $id: audio decode failed (${e.getMessage})", e)
      }
    val f = in.getFormat
    if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        || f.getSampleSizeInBits != 16 || f.isBigEndian)
      throw new IllegalArgumentException(
        s"doc $id: unsupported PCM layout ($f) — 16-bit signed LE only")
    val raw = try in.readAllBytes() finally in.close()
    val ch = f.getChannels
    val nSamples = raw.length / 2
    val nFrames = nSamples / ch
    var sumSq = 0L
    var peak = 0
    var crossings = 0L
    val lastSign = new Array[Int](ch) // 0 = no nonzero sample seen yet
    var i = 0
    while (i < nSamples) {
      val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort.toInt
      sumSq += s.toLong * s
      val a = math.abs(s)
      if (a > peak) peak = a
      if (s != 0) {
        val c = i % ch
        val sign = if (s > 0) 1 else -1
        if (lastSign(c) != 0 && lastSign(c) != sign) crossings += 1
        lastSign(c) = sign
      }
      i += 1
    }
    val rms =
      if (nSamples == 0) 0.0
      else math.round(math.sqrt(sumSq.toDouble / nSamples) * 10000)
        .toDouble / 10000
    AudioStats(id, f.getSampleRate.toInt, ch, 16, nFrames,
      if (f.getSampleRate > 0) nFrames * 1000L / f.getSampleRate.toInt
      else 0L,
      rms, crossings, peak)
  }

  // ---- video (ISO-BMFF headers) ------------------------------------------

  final case class VideoMeta(doc_id: Long, width: Int, height: Int,
                             duration_ms: Long, n_tracks: Int)

  /** Pure-JVM ISO-BMFF (MP4/MOV) header walk: (width, height,
    * durationMs, nTracks) from moov/mvhd + the first trak/tkhd with
    * nonzero dims (audio tracks carry 0×0). Handles mvhd/tkhd versions
    * 0 and 1; refuses (None) on malformed or truncated boxes rather
    * than guessing. */
  private def u8b(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16b(b: Array[Byte], i: Int): Int =
    (u8b(b, i) << 8) | u8b(b, i + 1)
  private def be32b(b: Array[Byte], i: Int): Long =
    ((u8b(b, i).toLong << 24) | (u8b(b, i + 1) << 16) |
      (u8b(b, i + 2) << 8) | u8b(b, i + 3)) & 0xffffffffL
  private def be64b(b: Array[Byte], i: Int): Long =
    (be32b(b, i) << 32) | be32b(b, i + 4)

  /** Walk sibling ISO-BMFF boxes in [from, to): call f(type,
    * payloadFrom, payloadTo); returns false on malformed structure.
    * Handles the two special size encodings real-world files use:
    * size==1 carries a 64-bit largesize after the type (the
    * large-mdat-before-moov layout every long recording has), and
    * size==0 means the box extends to the END OF FILE — which ISO 14496-12
    * permits ONLY for the last top-level box, so it is accepted solely
    * when `topLevel` is set (and is final by construction, end = `to`).
    * Inside a container a size-0 box is malformed — accepting it there
    * would silently swallow every following sibling and report their
    * fields as absent instead of refusing the file (refuse-don't-guess).
    * Shared by [[parseMp4Header]] and [[parseMp4Tracks]]. */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int,
                        topLevel: Boolean = false)
                       (f: (String, Int, Int) => Unit): Boolean = {
    var i = from
    while (i + 8 <= to) {
      val size = be32b(b, i)
      val typ = new String(b.slice(i + 4, i + 8), "ISO-8859-1")
      val (p0, end) =
        if (size == 1L) {
          // largesize: 64-bit length INCLUDING the 16 header bytes
          if (i + 16 > to) return false
          val ls = be64b(b, i + 8)
          if (ls < 16 || ls > to - i) return false
          (i + 16, i + ls.toInt)
        } else if (size == 0L) {
          if (!topLevel) return false
          (i + 8, to)
        } else {
          if (size < 8 || i + size > to) return false
          (i + 8, i + size.toInt)
        }
      f(typ, p0, end)
      i = end
    }
    i == to || i + 8 > to
  }

  def parseMp4Header(b: Array[Byte]): Option[(Int, Int, Long, Int)] = {
    def u8(i: Int) = u8b(b, i)
    def be32(i: Int): Long = be32b(b, i)
    def be64(i: Int): Long = be64b(b, i)
    val n = b.length
    def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Boolean =
      walkBoxes(b, from, to)(f)

    if (n < 16) return None
    var moov: Option[(Int, Int)] = None
    if (!walkBoxes(b, 0, n, topLevel = true) { (t, p0, p1) =>
          if (t == "moov") moov = Some((p0, p1)) })
      return None
    val (m0, m1) = moov.getOrElse(return None)
    var timescale = 0L; var duration = -1L
    var nTracks = 0; var width = 0; var height = 0
    val ok = walk(m0, m1) { (t, p0, p1) =>
      if (t == "mvhd" && p1 - p0 >= 20) {
        val v = u8(p0)
        if (v == 0 && p1 - p0 >= 20) {
          timescale = be32(p0 + 12); duration = be32(p0 + 16)
        } else if (v == 1 && p1 - p0 >= 32) {
          timescale = be32(p0 + 20); duration = be64(p0 + 24)
        }
      } else if (t == "trak") {
        nTracks += 1
        walk(p0, p1) { (tt, q0, q1) =>
          if (tt == "tkhd") {
            // v0: width at payload+76. v1 widens THREE time fields
            // (ctime, mtime, duration each 4→8 bytes) so the delta is
            // +12, putting width at +88 — not +8/+84, the classic
            // only-ctime/mtime-counted mistake
            val off = if (u8(q0) == 1) 88 else 76
            if (q1 - q0 >= off + 8 && width == 0 && height == 0) {
              val w = (be32(q0 + off) >> 16).toInt
              val h = (be32(q0 + off + 4) >> 16).toInt
              if (w > 0 && h > 0) { width = w; height = h }
            }
          }
        }
        ()
      }
    }
    if (!ok || timescale <= 0 || duration < 0 || nTracks == 0) None
    else Some((width, height, duration * 1000L / timescale, nTracks))
  }

  def decodeVideoMeta(id: Long, bytes: Array[Byte]): VideoMeta = {
    val (w, h, d, t) = parseMp4Header(bytes).getOrElse(throw
      new IllegalArgumentException(
        s"doc $id: not an ISO-BMFF header (${bytes.length} bytes)"))
    VideoMeta(id, w, h, d, t)
  }

  /** Per-track sample-table depth (r15): codec fourcc + coded dims from
    * the stsd sample entry, sample count from stsz, chunk count from
    * stco — the filters a video corpus runs AFTER dims/duration
    * ([[parseMp4Header]]): codec allowlists, frames-per-clip floors,
    * fragmentation tells. `None` fields mean the box is genuinely
    * absent (honest absence, not fabrication — including track_id when
    * the trak carries no parseable tkhd); malformed box structure
    * refuses the whole file like the header walk. */
  final case class Mp4Track(track_id: Option[Int], handler: Option[String],
                            codec: Option[String], width: Option[Int],
                            height: Option[Int], n_samples: Option[Long],
                            n_chunks: Option[Long],
                            sync_samples: Option[Seq[Long]] = None,
                            n_ctts_entries: Option[Long] = None,
                            max_ctts_offset: Option[Long] = None)

  /** All tracks of an ISO-BMFF payload via the stbl walk
    * (trak → mdia → hdlr/minf → stbl → stsd/stsz/stco), or None on
    * malformed structure / no moov / no traks. Sample-entry dims are
    * read only for video handlers and only from a full-size
    * VisualSampleEntry (>= 86 bytes) — an audio entry is 36 bytes and
    * reading dims from it would fabricate. */
  def parseMp4Tracks(b: Array[Byte]): Option[Seq[Mp4Track]] = {
    val n = b.length
    if (n < 16) return None
    var moov: Option[(Int, Int)] = None
    if (!walkBoxes(b, 0, n, topLevel = true) { (t, p0, p1) =>
          if (t == "moov" && moov.isEmpty) moov = Some((p0, p1)) })
      return None
    val (m0, m1) = moov.getOrElse(return None)
    val out = Seq.newBuilder[Mp4Track]
    var ok = true
    val okWalk = walkBoxes(b, m0, m1) { (t, p0, p1) =>
      if (t == "trak") {
        // Option, not a -1 sentinel: a trak with no (or a truncated) tkhd
        // reports track_id as NULL like every other honest-absence field
        var id: Option[Int] = None
        var handler: Option[String] = None
        var codec: Option[String] = None
        var w: Option[Int] = None; var h: Option[Int] = None
        var nSamp: Option[Long] = None; var nChunk: Option[Long] = None
        var syncs: Option[Seq[Long]] = None
        var nCtts: Option[Long] = None; var maxCtts: Option[Long] = None
        if (!walkBoxes(b, p0, p1) { (tt, q0, q1) =>
          if (tt == "tkhd" && q1 - q0 >= 24) {
            // v0: version/flags + ctime + mtime → id at +12;
            // v1 widens ctime/mtime to 64 bits → id at +20
            id = Some((if (u8b(b, q0) == 1) be32b(b, q0 + 20)
                       else be32b(b, q0 + 12)).toInt)
          } else if (tt == "mdia") {
            if (!walkBoxes(b, q0, q1) { (t3, r0, r1) =>
              if (t3 == "hdlr" && r1 - r0 >= 12)
                handler = Some(new String(b.slice(r0 + 8, r0 + 12),
                  "ISO-8859-1"))
              else if (t3 == "minf") {
                if (!walkBoxes(b, r0, r1) { (t4, s0, s1) =>
                  if (t4 == "stbl") {
                    if (!walkBoxes(b, s0, s1) { (t5, u0, u1) =>
                      t5 match {
                        case "stsd" if u1 - u0 >= 16 =>
                          // version/flags(4) entry_count(4), then the
                          // first sample entry as a nested box
                          val cnt = be32b(b, u0 + 4)
                          if (cnt >= 1) {
                            val es = be32b(b, u0 + 8)
                            if (es >= 8 && u0 + 8 + es <= u1) {
                              codec = Some(new String(
                                b.slice(u0 + 12, u0 + 16), "ISO-8859-1"))
                              // VisualSampleEntry: dims at entry+32/34
                              if (es >= 86 && handler.contains("vide")) {
                                w = Some(be16b(b, u0 + 8 + 32))
                                h = Some(be16b(b, u0 + 8 + 34))
                              }
                            }
                          }
                        case "stsz" if u1 - u0 >= 12 =>
                          // sample_size(4) then sample_count(4)
                          nSamp = Some(be32b(b, u0 + 8))
                        case "stco" if u1 - u0 >= 8 =>
                          nChunk = Some(be32b(b, u0 + 4))
                        case "stss" if u1 - u0 >= 8 =>
                          // sync-sample (keyframe) table: entry_count, then
                          // 1-based sample numbers. A count overrunning the
                          // box refuses the file (refuse-don't-guess, same
                          // contract as every other malformed box)
                          val cnt = be32b(b, u0 + 4)
                          if (u0.toLong + 8 + 4L * cnt > u1) ok = false
                          else syncs = Some((0 until cnt.toInt).map(i =>
                            be32b(b, u0 + 8 + 4 * i)))
                        case "ctts" if u1 - u0 >= 8 =>
                          // composition-offset table: (sample_count,
                          // offset) pairs; v1 offsets are SIGNED (negative
                          // offsets are the b-frame reorder tell). Only the
                          // entry count and max offset are surfaced — the
                          // corpus filters need the tell, not the table.
                          val cnt = be32b(b, u0 + 4)
                          val v1 = u8b(b, u0) == 1
                          if (u0.toLong + 8 + 8L * cnt > u1) ok = false
                          else {
                            nCtts = Some(cnt)
                            if (cnt > 0)
                              maxCtts = Some((0 until cnt.toInt).map { i =>
                                val raw = be32b(b, u0 + 12 + 8 * i)
                                if (v1) raw.toInt.toLong else raw
                              }.max)
                          }
                        case _ => ()
                      }
                    }) ok = false
                  }
                }) ok = false
              }
            }) ok = false
          }
        }) ok = false
        out += Mp4Track(id, handler, codec, w, h, nSamp, nChunk,
          syncs, nCtts, maxCtts)
      }
    }
    if (!okWalk || !ok) None
    else {
      val ts = out.result()
      if (ts.isEmpty) None else Some(ts)
    }
  }

  // ---- content-addressed reports (the q300 shape) -------------------------

  /** Committed audio/video fixtures (tools/gen_image_fixtures.py — every
    * stat hand-derivable from the documented sample formulas). */
  object Fixtures {
    val audio: Seq[String] =
      Seq("ramp_stereo.wav", "silence_441_mono.wav", "square_8k_mono.wav")
    val video: Seq[String] = Seq("clip_2trak.mp4", "clip_640x360.mp4")
    /** The track-depth pair (r15): a tkhd-only clip (every stbl field
      * honestly NULL) and the full-sample-table clip (avc1 + mp4a).
      * Separate from `video` so the r14 q307 keying is untouched. */
    val videoTracks: Seq[String] = Seq("clip_2trak.mp4", "clip_stbl.mp4")
    /** The sync-depth pair (r17): the stss+ctts clip (4 keyframes of 48,
      * two-entry ctts, real mdat) and the stss-less full-table clip —
      * whose keyframe fields must surface as honest NULLs. */
    val videoSync: Seq[String] = Seq("clip_sync.mp4", "clip_stbl.mp4")

    def df(spark: SparkSession, names: Seq[String]): DataFrame = {
      import spark.implicits._
      names.zipWithIndex
        .map { case (n, i) => (i.toLong, n, Multimodal.Fixtures.bytes(n)) }
        .toDF("media_key", "name", "media")
    }
  }

  /** Content-addressed REAL audio decode over a corpus: each DISTINCT
    * payload decoded exactly once executor-side, stats joined to corpus
    * row counts via [[Multimodal.contentAddressedJoin]] (decode cost
    * follows distinct media, not rows). */
  def audioStatsReport(df: DataFrame, keyCol: String, audio: DataFrame,
                       audioKeyCol: String = "media_key",
                       nameCol: String = "name",
                       binCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val decoded = audio
      .select(col(audioKeyCol).cast("long"), col(nameCol), col(binCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (k, name, bytes) =>
        val st = decodeAudioStats(k, bytes)
        (k, name, st.sample_rate, st.channels, st.n_frames, st.duration_ms,
          st.rms, st.zero_crossings, st.peak)
      })
      .toDF("media_key", "name", "sample_rate", "channels", "n_frames",
        "duration_ms", "rms", "zero_crossings", "peak")
    Multimodal.contentAddressedJoin(df, keyCol, decoded, "media_key")
  }

  /** Content-addressed per-TRACK sample-table report: one row per
    * (payload, track) with handler/codec/coded dims/sample count/chunk
    * count — the stage-two filter pass (codec allowlist, minimum frame
    * count) a video corpus runs after [[videoHeaderReport]]'s
    * dims/duration pruning. Decode cost follows distinct payloads. */
  def videoTrackReport(df: DataFrame, keyCol: String, video: DataFrame,
                       videoKeyCol: String = "media_key",
                       nameCol: String = "name",
                       binCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val decoded = video
      .select(col(videoKeyCol).cast("long"), col(nameCol), col(binCol))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (k, name, bytes) =>
        val tracks = parseMp4Tracks(bytes).getOrElse(throw
          new IllegalArgumentException(
            s"media $k ($name): not a parseable ISO-BMFF payload"))
        tracks.map(t => (k, name, t.track_id, t.handler, t.codec,
          t.width, t.height, t.n_samples, t.n_chunks))
      }
      .toDF("media_key", "name", "track_id", "handler", "codec",
        "width", "height", "n_samples", "n_chunks")
    Multimodal.contentAddressedJoin(df, keyCol, decoded, "media_key")
  }

  /** Content-addressed per-track KEYFRAME report (r17 — the stage the
    * stss/ctts depth feeds): sample count, sync-sample (keyframe) count,
    * keyframe share, and the composition-offset tell (entry count + max
    * offset — nonzero means frame reordering, i.e. b-frames). A track
    * without stss/ctts reports honest NULLs: per ISO 14496-12 an absent
    * stss means every sample is sync, which is the READER's inference to
    * make ([[keyframeSampleFrames]] makes it explicitly), not a number
    * the parser fabricates. */
  def videoKeyframeReport(df: DataFrame, keyCol: String, video: DataFrame,
                          videoKeyCol: String = "media_key",
                          nameCol: String = "name",
                          binCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val decoded = video
      .select(col(videoKeyCol).cast("long"), col(nameCol), col(binCol))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (k, name, bytes) =>
        val tracks = parseMp4Tracks(bytes).getOrElse(throw
          new IllegalArgumentException(
            s"media $k ($name): not a parseable ISO-BMFF payload"))
        tracks.map { t =>
          val nk = t.sync_samples.map(_.size.toLong)
          val share = for (n <- t.n_samples; k0 <- nk if n > 0L)
            yield math.round(k0.toDouble / n * 10000).toDouble / 10000
          (k, name, t.track_id, t.handler, t.n_samples, nk, share,
            t.n_ctts_entries, t.max_ctts_offset)
        }
      }
      .toDF("media_key", "name", "track_id", "handler", "n_samples",
        "n_keyframes", "keyframe_share", "n_ctts_entries",
        "max_ctts_offset")
    Multimodal.contentAddressedJoin(df, keyCol, decoded, "media_key")
  }

  /** KEYFRAME-ALIGNED frame sampling — [[Multimodal.sampleFrames]] with
    * the sample positions taken from the video track's stss instead of a
    * blind stride (a real video pipeline decodes at sync samples: those
    * are the only self-contained frames, and thumbnailing/shot-detection
    * pipelines sample exactly there). Frame k is the payload byte slice
    * [k·frameBytes, (k+1)·frameBytes) — the same stub-decode contract as
    * q58: the slicing/explode plumbing is real, the codec is not. When
    * stss is ABSENT, ISO 14496-12 defines every sample as sync, so the
    * sampler falls back to every `stride`-th sample of stsz's count —
    * the reader-side inference the report leaves NULL. Refuses payloads
    * with no parseable video track or no sample count; frames extending
    * past the payload are dropped (slice truth, not zero-padding). */
  def keyframeSampleFrames(video: DataFrame,
                           videoKeyCol: String = "media_key",
                           nameCol: String = "name",
                           binCol: String = "media",
                           frameBytes: Int = 32,
                           stride: Int = 4): DataFrame = {
    val spark = video.sparkSession
    import spark.implicits._
    video
      .select(col(videoKeyCol).cast("long"), col(nameCol), col(binCol))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (k, name, bytes) =>
        val tracks = parseMp4Tracks(bytes).getOrElse(throw
          new IllegalArgumentException(
            s"media $k ($name): not a parseable ISO-BMFF payload"))
        val vt = tracks.find(_.handler.contains("vide")).getOrElse(throw
          new IllegalArgumentException(
            s"media $k ($name): no video track to sample"))
        val idxs: Seq[Long] = vt.sync_samples match {
          case Some(ss) => ss.map(_ - 1) // 1-based sample numbers
          case None =>
            val n = vt.n_samples.getOrElse(throw
              new IllegalArgumentException(
                s"media $k ($name): no stss and no stsz sample count"))
            0L until n by stride
        }
        idxs.filter(i => i >= 0 && (i + 1) * frameBytes <= bytes.length)
          .map { i =>
            (k, name, i,
              java.util.Arrays.copyOfRange(bytes, (i * frameBytes).toInt,
                ((i + 1) * frameBytes).toInt))
          }
      }
      .toDF(videoKeyCol, nameCol, "frame_idx", "frame")
  }

  /** Content-addressed ISO-BMFF header report: the metadata pass a video
    * corpus runs before any frame work (duration/dims/track filters). */
  def videoHeaderReport(df: DataFrame, keyCol: String, video: DataFrame,
                        videoKeyCol: String = "media_key",
                        nameCol: String = "name",
                        binCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val decoded = video
      .select(col(videoKeyCol).cast("long"), col(nameCol), col(binCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (k, name, bytes) =>
        val m = decodeVideoMeta(k, bytes)
        (k, name, m.width, m.height, m.duration_ms, m.n_tracks)
      })
      .toDF("media_key", "name", "width", "height", "duration_ms",
        "n_tracks")
    Multimodal.contentAddressedJoin(df, keyCol, decoded, "media_key")
  }
}
