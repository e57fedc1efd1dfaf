package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CdcMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def envelope = {
    val rows = Seq(
      ("c", 1L, "alice", "db0", 1L),
      ("u", 2L, "bob", "db0", 2L),
      ("d", 3L, "carol", "db1", 1L))
    rows.toDF("op", "id", "name", "db", "server_id")
      .select(struct(
        col("op"),
        struct(col("id"), col("name")).as("before"),
        struct(col("id"), col("name")).as("after"),
        struct(col("db"), col("server_id")).as("source")).as("value"))
  }

  test("demux splits upserts from deletes with row_active/deleted_flag") {
    val out = CdcDemux.demux(envelope)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3), r.getString(4))).toSet
    assert(rows == Set(
      (1L, true, false, "db0"),
      (2L, true, false, "db0"),
      (3L, false, true, "db1")))
  }

  test("joinShards enriches on the (db, server_id) composite key") {
    val shards = Seq(("db0", 1L, "shard-a"), ("db0", 2L, "shard-b"), ("db1", 1L, "shard-c"))
      .toDF("db", "server_id", "shard_name")
    val out = CdcDemux.joinShards(CdcDemux.demux(envelope), shards)
    val m = out.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("shard_name")).toMap
    assert(m == Map(1L -> "shard-a", 2L -> "shard-b", 3L -> "shard-c"))
  }

  test("envelopeSchema builds the Debezium struct for any payload") {
    val payload = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("name", "string")
    val sch = CdcDemux.envelopeSchema(payload)
    val value = sch("value").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(value.fieldNames.toSeq == Seq("op", "before", "after", "source"))
  }

  test("decodeImages batches real header decode per binary payload") {
    val df = Seq(
      (1L, Multimodal.Fixtures.bytes("rgb_3x2.png")),
      (2L, Multimodal.Fixtures.bytes("lossy_17x9.webp")))
      .toDF("doc_id", "image")
    val out = Multimodal.decodeImages(spark, df)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).width == 3 && out(1L).height == 2 &&
      out(1L).channels == 3 && out(1L).n_bytes == 85)
    assert(out(2L).width == 17 && out(2L).height == 9)
    // a non-image payload surfaces as a per-partition failure, never
    // fabricated metadata
    val bad = Seq((3L, "not an image".getBytes)).toDF("doc_id", "image")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(spark, bad).collect()
    }
    assert(e.getMessage != null)
  }

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/images/$name")
    assert(in != null, s"missing committed fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("HeaderCodec parses real committed PNG/JPEG/GIF fixtures") {
    // fixtures are REAL container files built independently (python
    // struct/zlib), committed under test resources — not synthesized by
    // the parser under test
    val cases = Seq(
      ("rgb_3x2.png", (3, 2, 3)),
      ("gray_5x7.png", (5, 7, 1)),
      ("rgba_4x4.png", (4, 4, 4)),
      ("gray_1x1.jpg", (1, 1, 1)),
      // SOF stores HEIGHT before WIDTH — the swapped-dims trap
      ("ycbcr_8x16.jpg", (8, 16, 3)),
      // progressive (SOF2) frames parse through the same marker walk
      ("progressive_640x480.jpg", (640, 480, 3)),
      ("pixel_1x1.gif", (1, 1, 3)),
      // GIF dims are LITTLE-endian, unlike PNG/JPEG
      ("wide_300x200.gif", (300, 200, 3)))
    cases.foreach { case (name, want) =>
      val got = Multimodal.HeaderCodec.parseDims(fixture(name))
      assert(got.contains(want), s"$name: got $got want $want")
    }
    // full decode carries n_bytes + mean_byte alongside the parsed dims
    val m = Multimodal.HeaderCodec.decodeImage(7L, fixture("ycbcr_8x16.jpg"))
    assert(m.doc_id == 7L && m.width == 8 && m.height == 16 &&
      m.channels == 3 && m.n_bytes == 170 && m.mean_byte > 0.0)
  }

  test("HeaderCodec parses real committed WebP/BMP/TIFF fixtures") {
    // r14 fixtures from tools/gen_image_fixtures.py — python-struct-built
    // straight from the specs, sharing no code with the parser under test
    val cases = Seq(
      ("lossy_17x9.webp", (17, 9, 3)),
      ("lossless_33x21.webp", (33, 21, 3)),
      // VP8L alpha bit → 4 channels
      ("alpha_12x5.webp", (12, 5, 4)),
      // VP8X canvas dims are 24-bit LE minus-one; alpha flag set
      ("extended_640x360.webp", (640, 360, 4)),
      ("rgb_4x3.bmp", (4, 3, 3)),
      // negative biHeight = top-down row order, SAME pixel dims
      ("topdown_5x4.bmp", (5, 4, 3)),
      ("rgb_6x2.tif", (6, 2, 3)))
    cases.foreach { case (name, want) =>
      val got = Multimodal.HeaderCodec.parseDims(fixture(name))
      assert(got.contains(want), s"$name: got $got want $want")
    }
  }

  test("PixelCodec really decodes: dims match HeaderCodec, means match the pixel matrices") {
    // every fixture with real pixel data: REAL JDK ImageIO decode must
    // agree with the header parse on dimensions
    Multimodal.Fixtures.decodable.foreach { name =>
      val bytes = Multimodal.Fixtures.bytes(name)
      val hdr = Multimodal.HeaderCodec.parseDims(bytes)
      val px = Multimodal.PixelCodec.decodeStats(0L, bytes)
      assert(hdr.exists(t => t._1 == px.width && t._2 == px.height),
        s"$name: header $hdr vs pixel ${(px.width, px.height)}")
      assert(px.means.length == px.channels)
    }
    def stats(name: String) =
      Multimodal.PixelCodec.decodeStats(0L, Multimodal.Fixtures.bytes(name))
    // HAND-DERIVED anchors (independent of ImageIO): the BMP/TIFF pixel
    // matrices are documented in tools/gen_image_fixtures.py —
    //   rgb_4x3.bmp  pixel(x,y) = (10(x+1), 20(y+1), 5(x+y))
    //   topdown_5x4.bmp pixel(x,y) = (50x, 60y, 200) in TOP-DOWN row
    //     order (decoding must un-flip, or g would mirror)
    //   rgb_6x2.tif  pixel(x,y) = (40x, 100y, 30)
    assert(stats("rgb_4x3.bmp").means.toSeq == Seq(25.0, 40.0, 12.5))
    assert(stats("topdown_5x4.bmp").means.toSeq == Seq(100.0, 90.0, 200.0))
    assert(stats("rgb_6x2.tif").means.toSeq == Seq(100.0, 50.0, 30.0))
    assert(stats("rgb_4x3.bmp").channels == 3)
    // GRAY means are raw raster samples, NOT the gray→sRGB display values
    // (uniform-128 gray JPEG means 128, not getRGB's gamma-lifted 188)
    val g1 = stats("gray_1x1.jpg")
    assert(g1.channels == 1 && g1.means.toSeq == Seq(128.0))
    assert(stats("gray_5x7.png").means.toSeq == Seq(113.0))
    // decoder-anchored values for the remaining committed fixtures (the
    // q217 precedent: deterministic in this JVM, asserted so any decoder
    // drift fails HERE before the gate)
    assert(stats("pixel_1x1.gif").means.toSeq == Seq(255.0, 255.0, 255.0))
    assert(stats("wide_300x200.gif").means.toSeq == Seq(0.0, 0.0, 0.0))
    assert(stats("rgb_3x2.png").means.toSeq == Seq(39.5, 46.5, 53.5))
    val rgba = stats("rgba_4x4.png")
    assert(rgba.channels == 4 &&
      rgba.means.toSeq == Seq(72.0, 79.0, 86.0, 93.0))
    assert(stats("ycbcr_8x16.jpg").means.toSeq == Seq(128.0, 128.0, 128.0))
    // ImageCodec conformance: mean_byte = mean over all channel samples
    val meta = Multimodal.PixelCodec.decodeImage(9L,
      Multimodal.Fixtures.bytes("rgb_4x3.bmp"))
    // (25 + 40 + 12.5) / 3 = 25.8333…, 4-dp rounded by the codec
    assert(meta.doc_id == 9L && meta.width == 4 && meta.height == 3 &&
      meta.channels == 3 && meta.mean_byte == 25.8333)
  }

  test("dHash64: anchored values, transcode invariance, perturbation proximity") {
    // ORACLE ANCHORS (the q305 VALUES rows): pure integer arithmetic
    // over decoder output, so these are exact. The two collisions are
    // the perceptual point — rgb_4x3.bmp and rgba_4x4.png carry the
    // same horizontal gradient in different containers (one with an
    // alpha channel), and a perceptual hash MUST identify them where
    // whole-file hashing cannot.
    def dh(name: String) =
      Multimodal.PixelCodec.dHash64(0L, Multimodal.Fixtures.bytes(name))
    val anchors = Map(
      "gray_1x1.jpg" -> 0L,
      "gray_5x7.png" -> 6148914691236517205L,
      "pixel_1x1.gif" -> 0L,
      "rgb_3x2.png" -> 2604246222170760228L,
      "rgb_4x3.bmp" -> 3038287259199220266L,
      "rgb_6x2.tif" -> 7885078839350357357L,
      "rgba_4x4.png" -> 3038287259199220266L,
      "topdown_5x4.bmp" -> 6148914691236517205L,
      "wide_300x200.gif" -> 0L,
      "ycbcr_8x16.jpg" -> 0L)
    anchors.foreach { case (n, want) =>
      assert(dh(n) == want, s"$n: got ${dh(n)} want $want")
    }
    assert(dh("rgb_4x3.bmp") == dh("rgba_4x4.png"),
      "same gradient, different container: perceptual dup")

    // transcode invariance: decode the BMP, re-encode LOSSLESSLY as PNG
    // through ImageIO, and the perceptual hash must be identical
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.Fixtures.bytes("rgb_4x3.bmp")))
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", png)
    assert(Multimodal.PixelCodec.dHash64(0L, png.toByteArray) ==
      anchors("rgb_4x3.bmp"))

    // perturbation proximity: a 64x48 two-axis gradient vs the same
    // image with one corner cell blotted out — a few bits flip, never
    // most of them (the Hamming-ranks-near-dups contract); an UNRELATED
    // pattern sits far away
    def synth(blot: Boolean): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 48) {
        val r = x * 4 min 255; val g = y * 5 min 255
        b.setRGB(x, y, (r << 16) | (g << 8) | 64)
      }
      if (blot) for (x <- 0 until 8; y <- 0 until 6) b.setRGB(x, y, 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", out)
      out.toByteArray
    }
    val base = Multimodal.PixelCodec.dHash64(0L, synth(blot = false))
    val blotted = Multimodal.PixelCodec.dHash64(0L, synth(blot = true))
    val ham = java.lang.Long.bitCount(base ^ blotted)
    assert(ham >= 1 && ham <= 16, s"blot flipped $ham bits")
    val unrelated = Multimodal.PixelCodec.dHash64(0L,
      Multimodal.Fixtures.bytes("rgb_6x2.tif"))
    assert(java.lang.Long.bitCount(base ^ unrelated) > 16)
  }

  test("EXIF orientation: parse, dHash normalization, resize normalization") {
    val upright = Multimodal.Fixtures.bytes("rgb_6x2.tif")
    val rotated = Multimodal.Fixtures.bytes("rot90_2x6.tif")
    // tag parse: the committed twin carries Orientation 6; the upright
    // original carries no tag (spec default 1); non-TIFF/JPEG always 1
    assert(Multimodal.HeaderCodec.parseOrientation(upright) == 1)
    assert(Multimodal.HeaderCodec.parseOrientation(rotated) == 6)
    assert(Multimodal.HeaderCodec.parseOrientation(
      Multimodal.Fixtures.bytes("rgb_3x2.png")) == 1)
    // stored raster is genuinely rotated (2x6, not 6x2) — the JDK TIFF
    // reader does NOT auto-apply orientation, which is what makes the
    // normalization here load-bearing
    val st = Multimodal.PixelCodec.decodeStats(0L, rotated)
    assert(st.width == 2 && st.height == 6)
    // normalized dHash: the rotated twin must match the upright
    // original EXACTLY (lossless container + integer remap)
    val hu = Multimodal.PixelCodec.dHash64(0L, upright)
    val hr = Multimodal.PixelCodec.dHash64(0L, rotated)
    assert(hu == hr, s"rotated twin hashed $hr vs upright $hu")
    assert(hu == 7885078839350357357L) // the q305 oracle anchor
    // resize normalizes too: identity-resize of the rotated twin at the
    // DISPLAYED dims (6x2) reproduces the upright original's pixels
    val normPng = Multimodal.PixelCodec.resizePng(0L, rotated, 6, 2)
    val ns = Multimodal.PixelCodec.decodeStats(0L, normPng)
    assert(ns.width == 6 && ns.height == 2)
    val us = Multimodal.PixelCodec.decodeStats(0L, upright)
    assert(ns.means.toSeq == us.means.toSeq)
  }

  test("EXIF orientation: all 8 remaps agree with a per-pixel reference") {
    // spec-built little-endian TIFFs (independent byte layout from the
    // generator): a 16x12 asymmetric gradient stored under each
    // orientation so that the DISPLAYED image is identical — all 8 must
    // dHash to the same value
    def tiff(w: Int, h: Int, o: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val strip = (0 until h).flatMap(y => (0 until w).flatMap { x =>
        val (r, g, b) = pix(x, y); Seq(r.toByte, g.toByte, b.toByte)
      }).toArray
      def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
      def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte,
        (v >>> 16).toByte, (v >>> 24).toByte)
      def entry(tag: Int, typ: Int, cnt: Int, value: Array[Byte]) =
        le16(tag) ++ le16(typ) ++ le32(cnt) ++ value
      val n = 11
      val ifdOff = 8 + strip.length
      val bpsOff = ifdOff + 2 + n * 12 + 4
      val entries =
        entry(256, 4, 1, le32(w)) ++ entry(257, 4, 1, le32(h)) ++
        entry(258, 3, 3, le32(bpsOff)) ++
        entry(259, 3, 1, le16(1) ++ le16(0)) ++
        entry(262, 3, 1, le16(2) ++ le16(0)) ++
        entry(273, 4, 1, le32(8)) ++
        entry(274, 3, 1, le16(o) ++ le16(0)) ++
        entry(277, 3, 1, le16(3) ++ le16(0)) ++
        entry(278, 4, 1, le32(h)) ++
        entry(279, 4, 1, le32(strip.length)) ++
        entry(284, 3, 1, le16(1) ++ le16(0))
      Array[Byte]('I', 'I', 42, 0) ++ le32(8 + strip.length) ++ strip ++
        le16(n) ++ entries ++ le32(0) ++ le16(8) ++ le16(8) ++ le16(8)
    }
    // displayed reference: 16x12, asymmetric in both axes
    val W = 16; val H = 12
    def ref(x: Int, y: Int) = (x * 15 + 3, y * 20 + 1, (x * y) % 251)
    // stored(sx, sy) under orientation o must satisfy
    // displayed(x, y) == stored(map_o(x, y)) — invert by writing the
    // reference THROUGH the map
    def stored(o: Int): Array[Byte] = {
      val swap = o >= 5
      val (sw, sh) = if (swap) (H, W) else (W, H)
      val m = Array.ofDim[(Int, Int, Int)](sw, sh)
      for (y <- 0 until H; x <- 0 until W) {
        val sx = o match {
          case 2 | 3 => sw - 1 - x
          case 4 | 1 => x
          case 5 | 6 => y
          case _ => sw - 1 - y
        }
        val sy = o match {
          case 2 | 1 => y
          case 3 | 4 => sh - 1 - y
          case 5 => x
          case 6 | 7 => sh - 1 - x
          case _ => x
        }
        m(sx)(sy) = ref(x, y)
      }
      tiff(sw, sh, o, (a, b) => m(a)(b))
    }
    val hashes = (1 to 8).map(o =>
      o -> Multimodal.PixelCodec.dHash64(o.toLong, stored(o)))
    assert(hashes.map(_._2).distinct.size == 1,
      s"orientation remaps disagree: $hashes")
    // and the stored rasters genuinely differ (the remap is what
    // reconciles them): orientation 3's raw pixels are not the
    // reference's
    val raw3 = Multimodal.PixelCodec.decodeStats(3L, stored(3))
    val raw1 = Multimodal.PixelCodec.decodeStats(1L, stored(1))
    assert(raw3.width == W && raw3.height == H)
    assert(raw3.means.toSeq == raw1.means.toSeq) // means are invariant
  }

  test("committed rotated-JPEG twins: APP1 orientation 6, dHash Hamming 0") {
    // the q314 JPEG pair (tools/GenRotatedJpeg): gray, constant on every
    // 8x8 JPEG block, dims multiples of 8, quality 1.0 — the construction
    // that makes a LOSSY container rotation-exact (each block is coded
    // independently, so a value-v block decodes to the same f(v) wherever
    // it sits; rotation permutes whole blocks)
    val upright = Multimodal.Fixtures.bytes("rotpair_32x16.jpg")
    val rotated = Multimodal.Fixtures.bytes("rotpair_16x32.jpg")
    assert(Multimodal.HeaderCodec.parseOrientation(upright) == 1)
    assert(Multimodal.HeaderCodec.parseOrientation(rotated) == 6)
    // stored raster genuinely rotated: 16 wide x 32 tall
    val st = Multimodal.PixelCodec.decodeStats(0L, rotated)
    assert(st.width == 16 && st.height == 32)
    val hu = Multimodal.PixelCodec.dHash64(0L, upright)
    val hr = Multimodal.PixelCodec.dHash64(1L, rotated)
    assert(hu == hr, s"rotated JPEG twin hashed $hr vs upright $hu")
    assert(hu == 8825501086245354106L) // the q314 oracle anchor
    // provenance: regenerating from the documented formula reproduces the
    // committed PICTURES — compared as decoded rasters, not bytes (r16
    // ADVICE: byte identity pins the suite to the generating JDK's quant/
    // Huffman table choices and a JDK upgrade could fail it with the
    // orientation/dHash contract fully intact). The dHash/orientation
    // asserts above stay unconditional either way.
    def raster(id: Long, bytes: Array[Byte]): Seq[Any] = {
      val st = Multimodal.PixelCodec.decodeStats(id, bytes)
      Seq(st.width, st.height, st.means.toSeq)
    }
    assert(raster(0L, upright) ==
      raster(0L, graft.tools.GenRotatedJpeg.upright()))
    assert(raster(1L, rotated) ==
      raster(1L, graft.tools.GenRotatedJpeg.rotated()))
    assert(Multimodal.PixelCodec.dHash64(2L,
      graft.tools.GenRotatedJpeg.upright()) == hu)
    assert(Multimodal.PixelCodec.dHash64(3L,
      graft.tools.GenRotatedJpeg.rotated()) == hr)
  }

  test("EXIF orientation: JPEG APP1 parse + adversarial segments") {
    // build a real JPEG via the JDK encoder, then inject an APP1 Exif
    // segment after SOI — the crawl's rotated-camera-JPEG layout
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 4)
      img.setRGB(x, y, (x * 30 << 16) | (y * 60 << 8) | 99)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", out)
    val jpeg = out.toByteArray
    def app1(payload: Array[Byte]): Array[Byte] = {
      val len = payload.length + 2
      Array(0xff.toByte, 0xe1.toByte, (len >>> 8).toByte, len.toByte) ++
        payload
    }
    def exifTiff(o: Int): Array[Byte] =
      "Exif".getBytes ++ Array[Byte](0, 0) ++
        Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8, 0, 1) ++ // BE, 1 entry
        Array[Byte](0x01, 0x12, 0, 3, 0, 0, 0, 1,
          (o >>> 8).toByte, o.toByte, 0, 0) ++
        Array[Byte](0, 0, 0, 0)
    def inject(seg: Array[Byte]): Array[Byte] =
      jpeg.take(2) ++ seg ++ jpeg.drop(2)
    assert(Multimodal.HeaderCodec.parseOrientation(jpeg) == 1)
    assert(Multimodal.HeaderCodec.parseOrientation(
      inject(app1(exifTiff(6)))) == 6)
    assert(Multimodal.HeaderCodec.parseOrientation(
      inject(app1(exifTiff(8)))) == 8)
    // dims still parse through the injected segment
    assert(Multimodal.HeaderCodec.parseDims(inject(app1(exifTiff(6))))
      .contains((8, 4, 3)))
    // the oriented JPEG resizes on the DISPLAYED grid: 8x4 stored under
    // orientation 6 displays as 4x8
    val resized = Multimodal.PixelCodec.resizePng(0L,
      inject(app1(exifTiff(6))), 4, 8)
    val rs = Multimodal.PixelCodec.decodeStats(0L, resized)
    assert(rs.width == 4 && rs.height == 8)
    // adversarial: out-of-range value, wrong type, count != 1, a
    // non-Exif APP1 (XMP), and truncated Exif headers all fall back to
    // display-as-stored (1) — the spec's own default, never a crash
    assert(Multimodal.HeaderCodec.parseOrientation(
      inject(app1(exifTiff(9)))) == 1)
    assert(Multimodal.HeaderCodec.parseOrientation(
      inject(app1(exifTiff(0)))) == 1)
    val wrongType = exifTiff(6); wrongType(19) = 4 // type LONG, not SHORT
    assert(Multimodal.HeaderCodec.parseOrientation(
      inject(app1(wrongType))) == 1)
    val badCount = exifTiff(6); badCount(23) = 2 // count 2: offset field
    assert(Multimodal.HeaderCodec.parseOrientation(
      inject(app1(badCount))) == 1)
    assert(Multimodal.HeaderCodec.parseOrientation(
      inject(app1("http://ns.adobe.com/xap/1.0/".getBytes))) == 1)
    assert(Multimodal.HeaderCodec.parseOrientation(
      inject(app1("Exif".getBytes ++ Array[Byte](0, 0, 'M', 'M')))) == 1)
    assert(Multimodal.HeaderCodec.parseOrientation(
      inject(app1(Array[Byte]('E', 'x')))) == 1)
  }

  test("imageDHashPairs finds the cross-container perceptual dups") {
    val out = Multimodal.imageDHashPairs(Multimodal.Fixtures.df(spark))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.size == 45, "all unordered pairs of the 10 fixtures")
    assert(out(("rgb_4x3.bmp", "rgba_4x4.png")) == 0L)
    assert(out(("gray_5x7.png", "topdown_5x4.bmp")) == 0L)
    assert(out(("gray_1x1.jpg", "pixel_1x1.gif")) == 0L)
  }

  test("imageDHashPairs refuses past its row bound (all-pairs guard)") {
    // the report is SQL-reachable: the bounded-set precondition is
    // enforced, not advisory — a corpus-scale table must be routed to
    // the banded imageNearDups path instead of O(n^2) pairing
    val e = intercept[IllegalArgumentException] {
      Multimodal.imageDHashPairs(Multimodal.Fixtures.df(spark),
        maxImages = 5)
    }
    assert(e.getMessage.contains("image_near_dups"))
  }

  test("imageNearDups (banded) ≡ imageDHashPairs (all-pairs) at radius 3") {
    // pigeonhole: 4 bands, radius 3 -> banding recall is COMPLETE, so
    // the banded scale path must reproduce the all-pairs ground truth
    // exactly — pairs AND distances
    val banded = Multimodal.imageNearDups(Multimodal.Fixtures.df(spark),
        maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Number]("hamming").longValue())).toSet
    val brute = Multimodal.imageDHashPairs(Multimodal.Fixtures.df(spark))
      .filter(org.apache.spark.sql.functions.col("hamming") <= 3)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Number]("hamming").longValue())).toSet
    assert(banded == brute && banded.nonEmpty)
    // the cross-container duplicate must be among them
    assert(banded.exists(t =>
      t._1 == "rgb_4x3.bmp" && t._2 == "rgba_4x4.png" && t._3 == 0L))
  }

  test("resizePng: hand-derived box filter, identity round-trip, real re-decode") {
    def stats(b: Array[Byte]) = Multimodal.PixelCodec.decodeStats(0L, b)
    // HAND-DERIVED 2x2 resize of rgb_4x3.bmp (pixel(x,y) =
    // (10(x+1), 20(y+1), 5(x+y))): boxes {0,1}x{0}, {2,3}x{0},
    // {0,1}x{1,2}, {2,3}x{1,2} floor-average to
    // (15,20,2) (35,20,12) (15,50,10) (35,50,20) -> means (25, 35, 11)
    val r1 = stats(Multimodal.PixelCodec.resizePng(0L,
      Multimodal.Fixtures.bytes("rgb_4x3.bmp"), 2, 2))
    assert(r1.width == 2 && r1.height == 2 && r1.channels == 3)
    assert(r1.means.toSeq == Seq(25.0, 35.0, 11.0))
    // second independent hand derivation: topdown_5x4.bmp
    // (pixel = (50x, 60y, 200)) -> 2x2 means (87.5, 90, 200); ALSO
    // proves the decoder un-flipped the top-down row order before the
    // filter (a flipped read would swap the g rows but means hide that
    // — the per-cell values below do not):
    val td = Multimodal.PixelCodec.resizePng(0L,
      Multimodal.Fixtures.bytes("topdown_5x4.bmp"), 2, 2)
    val tdImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(td))
    // cell(0,0) g = avg(60*{0,1}) = 30, cell(0,1) g = avg(60*{2,3}) = 150
    assert(((tdImg.getRGB(0, 0) >>> 8) & 0xff) == 30)
    assert(((tdImg.getRGB(0, 1) >>> 8) & 0xff) == 150)
    assert(stats(td).means.toSeq == Seq(87.5, 90.0, 200.0))
    // resize to the source dims is the IDENTITY (each box = one pixel)
    Seq("rgb_4x3.bmp", "rgba_4x4.png", "gray_5x7.png").foreach { n =>
      val orig = stats(Multimodal.Fixtures.bytes(n))
      val same = stats(Multimodal.PixelCodec.resizePng(0L,
        Multimodal.Fixtures.bytes(n), orig.width, orig.height))
      assert(same.means.toSeq == orig.means.toSeq, n)
      assert(same.channels == orig.channels, n)
    }
    // upscale replicates the single source pixel
    val up = stats(Multimodal.PixelCodec.resizePng(0L,
      Multimodal.Fixtures.bytes("pixel_1x1.gif"), 3, 3))
    assert(up.width == 3 && up.height == 3 &&
      up.means.toSeq == Seq(255.0, 255.0, 255.0))
    // gray path stays gray (1 channel, raw samples — 113-mean fixture)
    val g = stats(Multimodal.PixelCodec.resizePng(0L,
      Multimodal.Fixtures.bytes("gray_5x7.png"), 2, 2))
    assert(g.channels == 1 && g.means.toSeq == Seq(100.75))
    // refusals: undecodable payload, bad dims
    intercept[IllegalArgumentException] {
      Multimodal.PixelCodec.resizePng(1L, "junk".getBytes, 2, 2)
    }
    intercept[IllegalArgumentException] {
      Multimodal.PixelCodec.resizePng(2L,
        Multimodal.Fixtures.bytes("rgb_4x3.bmp"), 0, 2)
    }
  }

  test("PixelCodec refuses undecodable payloads loudly") {
    // header-only progressive JPEG: HeaderCodec parses it, a REAL pixel
    // decode must throw (no scan data), never fabricate stats
    assert(Multimodal.HeaderCodec
      .parseDims(fixture("progressive_640x480.jpg")).isDefined)
    intercept[IllegalArgumentException] {
      Multimodal.PixelCodec.decodeStats(1L, fixture("progressive_640x480.jpg"))
    }
    // no JDK WebP decoder: headers parse, pixels refuse
    intercept[IllegalArgumentException] {
      Multimodal.PixelCodec.decodeStats(2L, fixture("lossy_17x9.webp"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.PixelCodec.decodeStats(3L, "not an image".getBytes)
    }
    intercept[IllegalArgumentException] {
      Multimodal.PixelCodec.decodeStats(4L, Array.emptyByteArray)
    }
  }

  test("pixelStatsReport: content-addressed decode joins real stats to row counts") {
    val rows = Seq.tabulate(37)(i => Tuple1(i.toLong % 10))
      .toDF("img_key")
    val out = Multimodal.pixelStatsReport(rows, "img_key",
        Multimodal.Fixtures.df(spark))
      .collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(out.size == 10)
    // img_key 0..6 appear 4x in 0..36, 7..9 appear 3x
    assert(out("gray_1x1.jpg").getAs[Long]("n_docs") == 4L)
    assert(out("ycbcr_8x16.jpg").getAs[Long]("n_docs") == 3L)
    val bmp = out("rgb_4x3.bmp")
    assert(bmp.getAs[Int]("width") == 4 && bmp.getAs[Int]("height") == 3)
    assert(bmp.getAs[Double]("mean_1") == 25.0 &&
      bmp.getAs[Double]("mean_3") == 12.5)
    // channels the payload lacks are NULL
    assert(out("gray_5x7.png").isNullAt(
      out("gray_5x7.png").fieldIndex("mean_2")))
  }

  test("HeaderCodec refuses non-image payloads instead of fabricating dims") {
    assert(Multimodal.HeaderCodec.parseDims("not an image".getBytes).isEmpty)
    assert(Multimodal.HeaderCodec.parseDims(Array.emptyByteArray).isEmpty)
    // JPEG SOI but stream ends before any SOF frame header
    assert(Multimodal.HeaderCodec.parseDims(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    // PNG signature with a truncated IHDR
    assert(Multimodal.HeaderCodec.parseDims(
      Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte)).isEmpty)
    intercept[IllegalArgumentException] {
      Multimodal.HeaderCodec.decodeImage(1L, "junk".getBytes)
    }
  }

  test("HeaderCodec fuzz: spec-conformant synthetic headers round-trip dims") {
    // independent encoders: these write container bytes straight from the
    // published specs (PNG ISO 15948 §11.2.2, JPEG ITU T.81 §B, GIF89a
    // appendix), sharing no code with the parser under test
    val rnd = new scala.util.Random(20260815L)
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array((v >>> 8).toByte, v.toByte)
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    def junk(n: Int) = Array.fill(n)(rnd.nextInt(256).toByte)

    val pngChannels = Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)
    def png(w: Int, h: Int, colorType: Int): Array[Byte] =
      Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
        Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte) ++
        junk(4 + rnd.nextInt(32)) // CRC + trailing chunk bytes

    val sofMarkers = (0xc0 to 0xcf).filterNot(Set(0xc4, 0xc8, 0xcc))
    def jpeg(w: Int, h: Int, ncomp: Int): Array[Byte] = {
      val segs = (0 until rnd.nextInt(4)).flatMap { _ =>
        // APPn/COM segment with a random payload, optionally preceded by
        // legal 0xff fill bytes
        val payload = junk(rnd.nextInt(64))
        val marker = if (rnd.nextBoolean()) 0xe0 + rnd.nextInt(16) else 0xfe
        Array.fill(rnd.nextInt(3))(0xff.toByte) ++
          Array(0xff.toByte, marker.toByte) ++ be16(payload.length + 2) ++
          payload
      }
      val sof = Array(0xff.toByte,
        sofMarkers(rnd.nextInt(sofMarkers.size)).toByte) ++
        be16(8 + 3 * ncomp) ++ Array(8.toByte) ++ be16(h) ++ be16(w) ++
        Array(ncomp.toByte) ++ junk(3 * ncomp)
      Array(0xff.toByte, 0xd8.toByte) ++ segs ++ sof ++ junk(rnd.nextInt(16))
    }

    def gif(w: Int, h: Int): Array[Byte] =
      (if (rnd.nextBoolean()) "GIF87a" else "GIF89a").getBytes ++
        le16(w) ++ le16(h) ++ junk(3 + rnd.nextInt(16))

    // r14 formats, same independent-encoder discipline: WebP chunks per
    // RFC 9649 (+ VP8 RFC 6386 §9.1 / VP8L spec §3), BMP per the
    // BITMAPFILEHEADER/BITMAPINFOHEADER and CORE layouts, TIFF per
    // TIFF 6.0 §2 (both byte orders, IFD entries sorted by tag)
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte,
      (v >>> 24).toByte)
    def le24(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte)
    def riffWebp(tag: String, payload: Array[Byte]): Array[Byte] = {
      val chunk = tag.getBytes ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
      "RIFF".getBytes ++ le32(4 + chunk.length) ++ "WEBP".getBytes ++ chunk
    }
    def webpVp8(w: Int, h: Int): Array[Byte] =
      riffWebp("VP8 ", Array[Int](0x10, 0, 0, 0x9d, 0x01, 0x2a)
        .map(_.toByte) ++ le16(w) ++ le16(h) ++ junk(rnd.nextInt(16)))
    def webpVp8l(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
      val bits = (w - 1) | ((h - 1) << 14) | ((if (alpha) 1 else 0) << 28)
      riffWebp("VP8L", Array(0x2f.toByte) ++ le32(bits) ++
        junk(rnd.nextInt(16)))
    }
    def webpVp8x(w: Int, h: Int, alpha: Boolean): Array[Byte] =
      riffWebp("VP8X", Array[Int](if (alpha) 0x10 else 0x00, 0, 0, 0)
        .map(_.toByte) ++ le24(w - 1) ++ le24(h - 1) ++ junk(rnd.nextInt(8)))
    def bmp(w: Int, h: Int, topdown: Boolean, bc: Int): Array[Byte] = {
      val hSigned = if (topdown) -h else h
      "BM".getBytes ++ le32(54) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(w) ++ le32(hSigned) ++
        Array(1.toByte, 0.toByte, bc.toByte, (bc >>> 8).toByte) ++
        le32(0) ++ le32(0) ++ junk(16 + rnd.nextInt(16))
    }
    def tiff(w: Int, h: Int, spp: Int, photo: Int,
             bigEndian: Boolean): Array[Byte] = {
      def x16(v: Int) = if (bigEndian) be16(v)
        else Array(v.toByte, (v >>> 8).toByte)
      def x32(v: Int) = if (bigEndian) be32(v) else le32(v)
      // SHORT values are left-justified in the 4-byte field in BOTH byte
      // orders (TIFF 6.0 §2: value "begins" at the field's first byte)
      def entryShort(tag: Int, v: Int) =
        x16(tag) ++ x16(3) ++ x32(1) ++ x16(v) ++ x16(0)
      def entryLong(tag: Int, v: Int) = x16(tag) ++ x16(4) ++ x32(1) ++ x32(v)
      // dims randomly SHORT or LONG typed — both legal per spec
      val widthE = if (rnd.nextBoolean() && w <= 0xffff)
        entryShort(256, w) else entryLong(256, w)
      val heightE = if (rnd.nextBoolean() && h <= 0xffff)
        entryShort(257, h) else entryLong(257, h)
      val entries = Seq(widthE, heightE, entryShort(262, photo)) ++
        (if (spp > 0) Seq(entryShort(277, spp)) else Nil)
      val magic = if (bigEndian) Array[Byte]('M', 'M', 0, 42)
        else Array[Byte]('I', 'I', 42, 0)
      magic ++ x32(8) ++ x16(entries.length) ++
        entries.flatten.toArray ++ x32(0) ++ junk(rnd.nextInt(16))
    }

    (1 to 200).foreach { i =>
      val w = 1 + rnd.nextInt(65535); val h = 1 + rnd.nextInt(65535)
      val ct = Seq(0, 2, 3, 4, 6)(rnd.nextInt(5))
      assert(Multimodal.HeaderCodec.parseDims(png(w, h, ct))
        .contains((w, h, pngChannels(ct))), s"png trial $i ($w x $h ct=$ct)")
      val nc = Seq(1, 3, 4)(rnd.nextInt(3))
      assert(Multimodal.HeaderCodec.parseDims(jpeg(w, h, nc))
        .contains((w, h, nc)), s"jpeg trial $i ($w x $h nc=$nc)")
      assert(Multimodal.HeaderCodec.parseDims(gif(w, h))
        .contains((w, h, 3)), s"gif trial $i ($w x $h)")
      // WebP dims are 14-bit; BMP/TIFF take the full range
      val w14 = 1 + rnd.nextInt(0x3fff); val h14 = 1 + rnd.nextInt(0x3fff)
      val alpha = rnd.nextBoolean()
      assert(Multimodal.HeaderCodec.parseDims(webpVp8(w14, h14))
        .contains((w14, h14, 3)), s"vp8 trial $i ($w14 x $h14)")
      assert(Multimodal.HeaderCodec.parseDims(webpVp8l(w14, h14, alpha))
        .contains((w14, h14, if (alpha) 4 else 3)), s"vp8l trial $i")
      assert(Multimodal.HeaderCodec.parseDims(webpVp8x(w, h, alpha))
        .contains((w, h, if (alpha) 4 else 3)), s"vp8x trial $i")
      val topdown = rnd.nextBoolean()
      val bc = Seq(1, 4, 8, 16, 24, 32)(rnd.nextInt(6))
      assert(Multimodal.HeaderCodec.parseDims(bmp(w, h, topdown, bc))
        .contains((w, h, if (bc == 32) 4 else 3)),
        s"bmp trial $i ($w x $h topdown=$topdown bc=$bc)")
      val spp = Seq(-1, 1, 3, 4)(rnd.nextInt(4))
      val photo = Seq(0, 1, 2, 3)(rnd.nextInt(4))
      val wantCh = if (spp > 0) spp else if (photo >= 2) 3 else 1
      assert(Multimodal.HeaderCodec.parseDims(
          tiff(w, h, spp, photo, rnd.nextBoolean()))
        .contains((w, h, wantCh)), s"tiff trial $i (spp=$spp photo=$photo)")
      // truncating a valid container anywhere inside the header must
      // refuse, never throw or fabricate wrong dims: parse(prefix) is
      // either None or the true dims — contract held per format
      def prefixContract(full: Array[Byte], want: (Int, Int, Int),
                         label: String): Unit = {
        val cut = full.take(2 + rnd.nextInt(full.length - 2))
        val got = Multimodal.HeaderCodec.parseDims(cut)
        assert(got.isEmpty || got.contains(want), s"$label prefix trial $i")
      }
      prefixContract(jpeg(w, h, nc), (w, h, nc), "jpeg")
      prefixContract(webpVp8l(w14, h14, alpha),
        (w14, h14, if (alpha) 4 else 3), "vp8l")
      prefixContract(bmp(w, h, topdown, bc),
        (w, h, if (bc == 32) 4 else 3), "bmp")
      prefixContract(tiff(w, h, spp, photo, false), (w, h, wantCh), "tiff")
    }
  }

  test("decodeImages runs the real HeaderCodec through the Dataset path") {
    val rows = Seq(
      (1L, fixture("rgb_3x2.png")),
      (2L, fixture("ycbcr_8x16.jpg")),
      (3L, fixture("wide_300x200.gif")))
    val df = rows.toDF("doc_id", "image").repartition(3)
    val out = Multimodal
      .decodeImages(spark, df, codec = Multimodal.HeaderCodec)
      .collect().map(m => m.doc_id -> ((m.width, m.height, m.channels)))
      .toMap
    assert(out == Map(1L -> ((3, 2, 3)), 2L -> ((8, 16, 3)),
      3L -> ((300, 200, 3))))
  }

  test("compactNetEffect collapses op sequences to their net merge effect") {
    val ops = Seq(
      // k1: c,u,u -> net c with the LAST payload
      (1L, 10L, "c", 1.0), (1L, 11L, "u", 2.0), (1L, 12L, "u", 3.0),
      // k2: c,d -> born and died inside the batch -> none
      (2L, 20L, "c", 1.0), (2L, 21L, "d", 0.0),
      // k3: u,d -> net d
      (3L, 30L, "u", 5.0), (3L, 31L, "d", 0.0),
      // k4: u alone -> net u
      (4L, 40L, "u", 7.0),
      // k5: d,c (delete then re-insert) -> net u (target row survives, updated)
      (5L, 50L, "d", 0.0), (5L, 51L, "c", 9.0)
    ).toDF("k", "seq", "op", "v")
    val out = CdcProcessor.compactNetEffect(ops, "k", "seq", "op", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getDouble(3), r.getLong(4),
          r.getString(5)))).toMap
    assert(out(1L) == (("c", "u", 3.0, 3L, "c")))
    assert(out(2L) == (("c", "d", 0.0, 2L, "none")))
    assert(out(3L) == (("u", "d", 0.0, 2L, "d")))
    assert(out(4L) == (("u", "u", 7.0, 1L, "u")))
    assert(out(5L) == (("d", "c", 9.0, 2L, "u")))
  }

  test("sampleFrames slices payload into strided fixed-size frames") {
    val df = Seq((1L, "a" * 100)).toDF("doc_id", "text")
      .withColumn("image", encode(col("text"), "UTF-8"))
    val frames = Multimodal.sampleFrames(df, frameBytes = 32, stride = 2)
    val idx = frames.select("frame_idx").as[Int].collect().toSeq
    assert(idx == Seq(0, 2)) // 3 frames (0,1,2), stride 2 keeps 0 and 2
    val lens = frames.select(length(col("frame"))).as[Int].collect()
    assert(lens.forall(_ <= 32))
  }

  test("chunkDedupReport: shared prefix chunks dedup; shifted content doesn't (fixed-size honesty)") {
    // chunkSize 4: "aaaabbbb" -> [aaaa, bbbb]; "aaaacccc" -> [aaaa, cccc]
    val df = Seq("aaaabbbb", "aaaacccc", "").toDF("payload")
    val r = Multimodal.chunkDedupReport(df, "payload", chunkSize = 4)
      .collect().head
    assert(r.getLong(0) == 2L, "empty payload excluded")
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.25, "one duplicated chunk of four")
    assert(r.getLong(4) == 2L)
    // a ONE-char insertion re-phases every later chunk: fixed-size chunking
    // finds nothing — the documented lower-bound behavior vs CDC
    val shifted = Seq("aaaabbbbccccdddd", "Xaaaabbbbccccdddd").toDF("payload")
    val s = Multimodal.chunkDedupReport(shifted, "payload", chunkSize = 4)
      .collect().head
    assert(s.getDouble(3) == 0.0, "re-phased content shares no fixed chunks")
  }

  test("cdcChunkDedupReport: boundaries re-sync after an insertion where fixed-size stays blind") {
    // a long pseudo-random payload (deterministic generator, varied bytes
    // so gear boundaries actually fire), duplicated with a 1-char prefix
    val rnd = new scala.util.Random(42)
    val payload = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val pair = Seq(payload, "X" + payload).toDF("payload")
    val fixed = Multimodal.chunkDedupReport(pair, "payload", chunkSize = 64)
      .collect().head
    val cdc = Multimodal.cdcChunkDedupReport(pair, "payload",
      minSize = 16, maskBits = 6, maxSize = 256).collect().head
    assert(fixed.getDouble(3) == 0.0, "fixed-size: fully re-phased")
    assert(cdc.getDouble(3) > 0.3,
      s"CDC must re-sync and find the shared tail: ${cdc.getDouble(3)}")
    // identical payloads: every chunk shared -> ratio 1/2 of chunk volume
    val twin = Seq(payload, payload).toDF("payload")
    val t = Multimodal.cdcChunkDedupReport(twin, "payload").collect().head
    assert(t.getDouble(3) == 0.5 && t.getLong(4) == 2L)
    // determinism + chunk-count sanity: ~len/2^maskBits chunks expected
    val one = Multimodal.cdcChunkDedupReport(Seq(payload).toDF("payload"),
      "payload").collect().head
    assert(one.getLong(1) == t.getLong(1) / 2)
    assert(one.getLong(1) >= 4000 / 256 && one.getLong(1) <= 4000 / 16)
  }
}
