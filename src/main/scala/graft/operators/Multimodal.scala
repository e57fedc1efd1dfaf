package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns with typed metadata alongside — the
  * layout a 100 TB multimodal corpus uses (parquet binary + pushed-down
  * metadata predicates, so a filter on width/duration never decodes bytes).
  *
  * Two codecs behind one seam: [[HeaderCodec]] parses dims/channels
  * straight from container headers (PNG/JPEG/GIF/WebP/BMP/TIFF — the
  * metadata pass that prunes a corpus before any pixel work) and
  * [[PixelCodec]] runs REAL pixel decode via the JDK's own
  * `javax.imageio` (PNG/JPEG/GIF/BMP/TIFF, headless, no external
  * library). Every gate path runs real container bytes; payloads no
  * codec recognizes refuse loudly (r15: the FakeCodec pseudo-decode
  * stand-in is gone).
  */
object Multimodal {

  final case class ImageMeta(doc_id: Long, n_bytes: Int, width: Int,
                             height: Int, channels: Int, mean_byte: Double)

  /** The decode seam: swap implementations without touching the Spark
    * plumbing (schema, batched mapPartitions, partitioning). */
  trait ImageCodec extends Serializable {
    def decodeImage(id: Long, bytes: Array[Byte]): ImageMeta
  }

  private def meanByte(bytes: Array[Byte]): Double = {
    val n = bytes.length
    if (n == 0) 0.0 else {
      var s = 0L; var i = 0
      while (i < n) { s += (bytes(i) & 0xff); i += 1 }
      math.round(s.toDouble / n * 10000).toDouble / 10000
    }
  }

  /** REAL pure-JVM header codec: parses width/height/channels straight
    * from the container header bytes — PNG IHDR, JPEG SOFn marker walk,
    * GIF logical screen descriptor, WebP (VP8 / VP8L / VP8X), BMP
    * (INFO and CORE DIB headers, incl. negative-height top-down), and
    * TIFF IFD (both byte orders) — no image library needed. This is the
    * metadata path a 100 TB media pipeline runs FIRST (dimension/aspect
    * filters prune the corpus before any pixel decode touches an
    * executor); full pixel decode stays behind the same [[ImageCodec]]
    * seam ([[PixelCodec]]). Unparseable payloads throw
    * `IllegalArgumentException` — surface them per-partition
    * (filter/`Try`) rather than silently fabricating dimensions. */
  object HeaderCodec extends ImageCodec {
    def decodeImage(id: Long, bytes: Array[Byte]): ImageMeta = {
      val (w, h, c) = parseDims(bytes).getOrElse(throw
        new IllegalArgumentException(
          s"doc $id: not a PNG/JPEG/GIF/WebP/BMP/TIFF header " +
            s"(${bytes.length} bytes)"))
      ImageMeta(id, bytes.length, w, h, c, meanByte(bytes))
    }

    /** EXIF/TIFF orientation (tag 0x0112, values 1-8) from a TIFF
      * container's first IFD or a JPEG's APP1 Exif segment; 1 (display
      * as stored) everywhere else. Absence of the tag MEANS
      * display-as-stored by spec, and every renderer treats a malformed
      * or out-of-range value the same way, so the 1 fallback is the
      * standard's own default, not a fabrication. A real crawl's rotated
      * JPEGs carry 6/8 here — [[PixelCodec.dHash64]] and
      * [[PixelCodec.resizePng]] normalize through this, so a
      * portrait/landscape transcoded pair still matches. */
    def parseOrientation(b: Array[Byte]): Int = {
      def u8(i: Int) = b(i) & 0xff
      val n = b.length
      val found: Option[Int] =
        if (n >= 8 && ((u8(0) == 'I' && u8(1) == 'I') ||
            (u8(0) == 'M' && u8(1) == 'M')))
          tiffOrientation(b, 0)
        else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
          // JPEG: walk markers to the first APP1 whose payload starts
          // "Exif\0\0"; the embedded TIFF structure sits right after
          var i = 2
          var res: Option[Int] = None
          var done = false
          while (!done && i + 3 < n) {
            if (u8(i) != 0xff) done = true
            else {
              var j = i
              while (j < n && u8(j) == 0xff) j += 1
              if (j >= n) done = true
              else {
                val m = u8(j)
                if (m == 0xd9 || m == 0xda) done = true // EOI/SOS: stop
                else if (m >= 0xd0 && m <= 0xd8) i = j + 1
                else if (j + 2 >= n) done = true
                else {
                  val len = ((u8(j + 1) << 8) | u8(j + 2))
                  if (m == 0xe1 && len >= 10 && j + 1 + len <= n &&
                      b.slice(j + 3, j + 9).sameElements(
                        Array[Byte]('E', 'x', 'i', 'f', 0, 0))) {
                    res = tiffOrientation(b, j + 9)
                    done = true
                  } else i = j + 1 + len
                }
              }
            }
          }
          res
        } else None
      found.getOrElse(1)
    }

    /** Tag-274 scan of a TIFF structure rooted at `base` (0 for a TIFF
      * file; the post-"Exif\0\0" offset for a JPEG APP1 segment). Both
      * byte orders; SHORT count==1 in [1,8] only — anything else is
      * treated as tag-absent (the display-as-stored default). */
    private def tiffOrientation(b: Array[Byte], base: Int): Option[Int] = {
      def u8(i: Int) = b(i) & 0xff
      val n = b.length
      if (base + 8 > n) return None
      val le = u8(base) == 'I' && u8(base + 1) == 'I'
      val be = u8(base) == 'M' && u8(base + 1) == 'M'
      if (!le && !be) return None
      def r16(i: Int) = if (le) u8(i) | (u8(i + 1) << 8)
        else (u8(i) << 8) | u8(i + 1)
      def r32(i: Int): Long =
        if (le) (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
          (u8(i + 3).toLong << 24)) & 0xffffffffL
        else ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
          u8(i + 3)) & 0xffffffffL
      if (r16(base + 2) != 42) return None
      val ifd = r32(base + 4)
      // LONG arithmetic: a crafted IFD offset near 2^32 must not wrap
      if (ifd < 8 || base + ifd + 2 > n) return None
      val i0 = (base + ifd).toInt
      val count = r16(i0)
      var e = 0
      while (e < count) {
        val off = i0 + 2 + e * 12
        if (off + 12 > n) return None
        if (r16(off) == 274) {
          // SHORT, count 1, value 1-8 — anything else is malformed and
          // means display-as-stored, same as the tag being absent
          return if (r16(off + 2) == 3 && r32(off + 4) == 1L &&
              r16(off + 8) >= 1 && r16(off + 8) <= 8)
            Some(r16(off + 8))
          else None
        }
        e += 1
      }
      None
    }

    /** (width, height, channels) from the header, or None if the payload
      * is not a recognizable PNG/JPEG/GIF/WebP/BMP/TIFF. */
    def parseDims(b: Array[Byte]): Option[(Int, Int, Int)] = {
      def u8(i: Int) = b(i) & 0xff
      def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int) =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      def le24(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      def le32(i: Int) =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      val n = b.length
      if (n >= 26 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
          u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a &&
          u8(6) == 0x1a && u8(7) == 0x0a &&
          b.slice(12, 16).sameElements("IHDR".getBytes)) {
        // IHDR is the first chunk by spec: width/height BE at 16/20,
        // color type at 25 → channel count (0 gray, 2 rgb, 3 palette,
        // 4 gray+alpha, 6 rgba)
        val channels = u8(25) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => return None
        }
        Some((be32(16), be32(20), channels))
      } else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG: walk the marker segments to the first SOFn (C0–CF minus
        // C4 DHT / C8 JPG / CC DAC). SOF payload: len(2) precision(1)
        // HEIGHT(2) WIDTH(2) ncomponents(1) — height first, the classic
        // swapped-dims trap.
        var i = 2
        while (i + 3 < n) {
          if (u8(i) != 0xff) return None
          var j = i
          while (j < n && u8(j) == 0xff) j += 1 // fill bytes are legal
          if (j >= n) return None
          val m = u8(j)
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
              m != 0xcc) {
            if (j + 8 >= n) return None
            return Some((be16(j + 6), be16(j + 4), u8(j + 8)))
          } else if (m == 0xd9 || m == 0xda) {
            return None // EOI/SOS before any SOF: no frame header
          } else if (m >= 0xd0 && m <= 0xd8) {
            i = j + 1 // standalone marker, no length field
          } else {
            if (j + 2 >= n) return None
            i = j + 1 + be16(j + 1)
          }
        }
        None
      } else if (n >= 10 && b.slice(0, 6).sameElements("GIF87a".getBytes)
          || n >= 10 && b.slice(0, 6).sameElements("GIF89a".getBytes)) {
        // logical screen descriptor: width/height LITTLE-endian at 6/8;
        // pixels index an RGB palette → 3 channels
        Some((le16(6), le16(8), 3))
      } else if (n >= 20 && b.slice(0, 4).sameElements("RIFF".getBytes) &&
          b.slice(8, 12).sameElements("WEBP".getBytes)) {
        // WebP: first chunk after the RIFF header decides the flavor
        val tag = new String(b.slice(12, 16), "ISO-8859-1")
        tag match {
          case "VP8 " if n >= 30 =>
            // lossy: 3-byte frame tag (bit0 = 0 → keyframe), start code
            // 9D 01 2A, then two LE16s whose low 14 bits are the dims
            if ((u8(20) & 1) == 0 && u8(23) == 0x9d && u8(24) == 0x01 &&
                u8(25) == 0x2a)
              Some((le16(26) & 0x3fff, le16(28) & 0x3fff, 3))
            else None
          case "VP8L" if n >= 25 =>
            // lossless: signature byte 2F then a LE32 bitfield —
            // width-1 (14 bits), height-1 (14), alpha (1), version (3,
            // must be 0)
            if (u8(20) != 0x2f) None
            else {
              val bits = le32(21)
              if (((bits >>> 29) & 0x7) != 0) None
              else Some(((bits & 0x3fff) + 1, ((bits >>> 14) & 0x3fff) + 1,
                if (((bits >>> 28) & 1) == 1) 4 else 3))
            }
          case "VP8X" if n >= 30 =>
            // extended: flags byte (bit4 = alpha), 3 reserved bytes,
            // 24-bit LE canvas width-1 / height-1
            Some((le24(24) + 1, le24(27) + 1,
              if ((u8(20) & 0x10) != 0) 4 else 3))
          case _ => None
        }
      } else if (n >= 26 && u8(0) == 'B' && u8(1) == 'M') {
        // BMP: DIB header size at 14 picks the layout. Height is SIGNED
        // in the INFO family — negative means top-down row order, same
        // pixel dims (the classic sign trap). Channels: 32-bit carries
        // alpha; everything else (1/4/8-bit palette, 16/24-bit RGB)
        // renders to RGB
        val dib = le32(14)
        if (dib == 12) {
          // BITMAPCOREHEADER: LE16 dims, unsigned — zero dims are
          // malformed, refuse like the INFO path does
          val w = le16(18); val h = le16(20)
          val bc = le16(24)
          if (w <= 0 || h <= 0) None
          else Some((w, h, if (bc == 32) 4 else 3))
        } else if (dib >= 40 && n >= 30) {
          val w = le32(18)
          val hRaw = le32(22)
          // abs(Int.MinValue) IS Int.MinValue — guard before abs, or a
          // crafted 0x80000000 height sails through as negative
          if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue) None
          else {
            val h = math.abs(hRaw)
            val bc = le16(28)
            Some((w, h, if (bc == 32) 4 else 3))
          }
        } else None
      } else if (n >= 8 &&
          (b.slice(0, 4).sameElements(Array[Byte]('I', 'I', 42, 0)) ||
           b.slice(0, 4).sameElements(Array[Byte]('M', 'M', 0, 42)))) {
        // TIFF: walk the first IFD for ImageWidth(256)/ImageLength(257),
        // SamplesPerPixel(277) with the PhotometricInterpretation(262)
        // default (RGB/palette → 3, gray/bilevel → 1). Both byte orders.
        val le = u8(0) == 'I'
        def r16(i: Int) = if (le) le16(i) else be16(i)
        def r32(i: Int) = if (le) le32(i) else be32(i)
        val ifd = r32(4)
        // LONG compare: an IFD offset near Int.MaxValue would wrap
        // 'ifd + 2' negative, pass the bound, and index out of bounds
        if (ifd < 8 || ifd.toLong + 2 > n) None
        else {
          val count = r16(ifd)
          var width = -1; var height = -1; var spp = -1; var photo = -1
          var e = 0
          var ok = true
          while (ok && e < count) {
            val off = ifd + 2 + e * 12
            if (off + 12 > n) ok = false
            else {
              val tag = r16(off)
              // SHORT(3) reads 2 bytes of the value field, LONG(4) reads
              // 4 — inline ONLY when count==1: a count>1 entry stores an
              // OFFSET in the value field, which read-as-value would
              // report as a fabricated dimension (conforming TIFFs use
              // count==1 for these tags; a crafted one must refuse)
              def value: Int =
                if (r32(off + 4) != 1) Int.MinValue
                else r16(off + 2) match {
                  case 3 => r16(off + 8)
                  case 4 => r32(off + 8)
                  case _ => -1
                }
              tag match {
                case 256 | 257 | 277 | 262 =>
                  val v = value
                  if (v == Int.MinValue) ok = false // count != 1: refuse
                  else tag match {
                    case 256 => width = v
                    case 257 => height = v
                    case 277 => spp = v
                    case _ => photo = v
                  }
                case _ => ()
              }
              e += 1
            }
          }
          if (!ok || width <= 0 || height <= 0) None
          else {
            val channels =
              if (spp > 0) spp
              else if (photo == 2 || photo == 3) 3
              else 1
            Some((width, height, channels))
          }
        }
      } else None
    }
  }

  /** Per-image DECODED statistics: dimensions, channel count, and the
    * per-channel sample means — the real product of a pixel decode. */
  final case class PixelStats(doc_id: Long, width: Int, height: Int,
                              channels: Int, means: Array[Double])

  /** REAL pixel decode via the JDK's own `javax.imageio` (headless; ships
    * with JDK 17 — PNG, JPEG, GIF, BMP, TIFF, WBMP readers, no external
    * library). Sits behind the same [[ImageCodec]] seam as
    * [[HeaderCodec]]: header parsing prunes a 100 TB media corpus by
    * dims/aspect WITHOUT touching pixels; this codec is the stage after —
    * full decode of the surviving payloads for content stats, resizing
    * inputs, perceptual hashing. Refuses loudly (IllegalArgumentException)
    * on undecodable payloads, like [[HeaderCodec]] — a corrupt image must
    * surface per-partition, never fabricate stats.
    *
    * Channel-mean semantics: GRAY images (1-2 channels) report raw
    * raster sample means — the stored sample values, NOT the
    * gray→sRGB-converted display values `getRGB` would give (e.g. a
    * uniform-113 gray PNG means 113.0, not the gamma-lifted 169.2).
    * COLOR images report sRGB means via `getRGB` (exact re-packs for
    * 8-bit component rasters; palette images expand through their color
    * table; JPEG YCbCr→RGB conversion already happened in the reader). */
  object PixelCodec extends ImageCodec {
    // executors have no display; must be set before any AWT class loads —
    // once per JVM (lazy val), not per decode call
    private lazy val headless: Unit =
      System.setProperty("java.awt.headless", "true")
    private def read(id: Long,
                     bytes: Array[Byte]): java.awt.image.BufferedImage = {
      headless
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"doc $id: pixel decode failed (${e.getMessage})", e)
        }
      if (img == null) throw new IllegalArgumentException(
        s"doc $id: no ImageIO reader recognizes the payload " +
          s"(${bytes.length} bytes)")
      img
    }

    /** Remap a decoded image to its DISPLAYED pixel grid per EXIF/TIFF
      * orientation `o` (1-8; [[HeaderCodec.parseOrientation]]): pure
      * integer coordinate remap, no interpolation, so normalized pixel
      * content is exact — a losslessly-stored rotated duplicate
      * normalizes to the IDENTICAL raster. Color copies through getRGB
      * (exact for 8-bit components); `grayRaster` keeps raw gray
      * samples in a byte raster (the resize path's no-sRGB-lift
      * contract; caller enforces <= 8-bit first). o == 1 returns the
      * image untouched. */
    private def reorient(img: java.awt.image.BufferedImage, o: Int,
        grayRaster: Boolean): java.awt.image.BufferedImage = {
      if (o == 1) return img
      val w = img.getWidth; val h = img.getHeight
      val swap = o >= 5
      val ow = if (swap) h else w
      val oh = if (swap) w else h
      val out = new java.awt.image.BufferedImage(ow, oh,
        if (grayRaster) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else if (img.getColorModel.hasAlpha)
          java.awt.image.BufferedImage.TYPE_INT_ARGB
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      // bulk read/remap/write: per-pixel getRGB/setRGB round-trips pay a
      // ColorModel conversion + bounds check EACH — one bulk conversion
      // pass into an int[] then an index remap is identical output at a
      // fraction of the cost (the decode-adjacent hot loop of a corpus
      // pass over rotated images)
      val src: Array[Int] =
        if (grayRaster) null else img.getRGB(0, 0, w, h, null, 0, w)
      val dst: Array[Int] = if (grayRaster) null else new Array[Int](ow * oh)
      var y = 0
      while (y < oh) {
        var x = 0
        while (x < ow) {
          // displayed (x, y) ← stored (sx, sy), EXIF 2.32 Orientation
          val sx = o match {
            case 2 | 3 => w - 1 - x
            case 4 => x
            case 5 | 6 => y
            case _ => w - 1 - y // 7, 8
          }
          val sy = o match {
            case 2 => y
            case 3 | 4 => h - 1 - y
            case 5 => x
            case 6 | 7 => h - 1 - x
            case _ => x // 8
          }
          if (grayRaster) out.getRaster.setSample(x, y, 0,
            img.getRaster.getSample(sx, sy, 0))
          else dst(y * ow + x) = src(sy * w + sx)
          x += 1
        }
        y += 1
      }
      if (!grayRaster) out.setRGB(0, 0, ow, oh, dst, 0, ow)
      out
    }

    /** Stats are of the STORED raster (dims as encoded; per-channel
      * means are orientation-invariant anyway) — only the perceptual /
      * resize paths normalize orientation, where pixel GEOMETRY is the
      * product. */
    def decodeStats(id: Long, bytes: Array[Byte]): PixelStats = {
      val img = read(id, bytes)
      val cm = img.getColorModel
      val w = img.getWidth; val h = img.getHeight
      // gray and RGB(A) only: a 4-color-component model WITHOUT alpha
      // (CMYK TIFF — the JDK TIFF reader decodes Separated) would make
      // the sRGB loop below fabricate a 4th-channel mean of 0.0, and
      // anything wider overruns the sums array. Refuse loudly instead —
      // the never-fabricate contract.
      if (cm.getNumColorComponents != 1 && cm.getNumColorComponents != 3)
        throw new IllegalArgumentException(
          s"doc $id: unsupported color model " +
            s"(${cm.getNumColorComponents} color components) — " +
            "gray and RGB(A) only")
      val channels = cm.getNumColorComponents + (if (cm.hasAlpha) 1 else 0)
      val n = w.toLong * h
      val sums = new Array[Long](4)
      if (cm.getNumColorComponents == 1) {
        val r = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sums(0) += r.getSample(x, y, 0)
            if (cm.hasAlpha) sums(1) += r.getSample(x, y, 1)
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sums(0) += (p >>> 16) & 0xff
            sums(1) += (p >>> 8) & 0xff
            sums(2) += p & 0xff
            if (cm.hasAlpha) sums(3) += (p >>> 24) & 0xff
            x += 1
          }
          y += 1
        }
      }
      PixelStats(id, w, h, channels,
        Array.tabulate(channels)(i => sums(i).toDouble / n))
    }

    /** [[ImageCodec]] conformance: `mean_byte` is the mean over ALL
      * channel samples (channels weigh equally — each has w*h samples). */
    def decodeImage(id: Long, bytes: Array[Byte]): ImageMeta = {
      val st = decodeStats(id, bytes)
      val mean = st.means.sum / st.channels
      ImageMeta(id, bytes.length, st.width, st.height, st.channels,
        math.round(mean * 10000).toDouble / 10000)
    }

    /** Deterministic box-filter RESIZE over REAL decoded pixels,
      * re-encoded LOSSLESSLY as PNG — the training-input normalization
      * stage (thumbnail / fixed-resolution model input). Each output
      * pixel is the floor-average of its integer source box (the same
      * grid arithmetic as [[dHash64]]) — no `Graphics2D` interpolation,
      * whose output can drift across JVMs/platforms, so resized pixel
      * content is oracle-stable. Resizing to the source dims is the
      * IDENTITY (each box is one pixel). Gray stays a gray PNG (raw
      * raster band — no sRGB lift), color resizes in sRGB with alpha
      * preserved; gray+alpha refuses (no fixture class, and silently
      * dropping alpha would fabricate). */
    def resizePng(id: Long, bytes: Array[Byte], outW: Int,
                  outH: Int): Array[Byte] = {
      // dims bounded so the Long box arithmetic below can never place a
      // source coordinate out of range (and a million-pixel side is past
      // any training-input use anyway)
      require(outW >= 1 && outH >= 1 && outW <= (1 << 20) &&
        outH <= (1 << 20),
        s"doc $id: resize dims must be in [1, ${1 << 20}]")
      val img = read(id, bytes)
      val cm = img.getColorModel
      if (cm.getNumColorComponents != 1 && cm.getNumColorComponents != 3)
        throw new IllegalArgumentException(
          s"doc $id: unsupported color model for resize")
      if (cm.getNumColorComponents == 1 && cm.hasAlpha)
        throw new IllegalArgumentException(
          s"doc $id: gray+alpha resize unsupported")
      // the gray path copies RAW raster samples into a byte raster —
      // a 16-bit gray source would silently truncate to the low byte
      // (fabricated stats); refuse loudly like the CMYK case
      if (cm.getNumColorComponents == 1 && cm.getComponentSize(0) > 8)
        throw new IllegalArgumentException(
          s"doc $id: ${cm.getComponentSize(0)}-bit gray resize " +
            "unsupported (8-bit samples only)")
      val gray0 = cm.getNumColorComponents == 1
      // resize operates on the DISPLAYED image: EXIF orientation is
      // normalized (exact integer remap) before the box filter, and the
      // lossless PNG output carries upright pixels — the normalization
      // a training-input stage needs (feeding a model the stored raster
      // of a rotated JPEG trains on sideways pictures)
      val src = reorient(img, HeaderCodec.parseOrientation(bytes),
        grayRaster = gray0)
      val w = src.getWidth; val h = src.getHeight
      val gray = gray0
      val out = new java.awt.image.BufferedImage(outW, outH,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else if (cm.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      var gx = 0
      while (gx < outW) {
        // LONG multiply: gx * w overflows Int for large upscales
        val x0 = (gx.toLong * w / outW).toInt
        val x1 = math.max(x0 + 1, ((gx + 1).toLong * w / outW).toInt)
        var gy = 0
        while (gy < outH) {
          val y0 = (gy.toLong * h / outH).toInt
          val y1 = math.max(y0 + 1, ((gy + 1).toLong * h / outH).toInt)
          var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L; var n = 0L
          var x = x0
          while (x < x1 && x < w) {
            var y = y0
            while (y < y1 && y < h) {
              if (gray) sr += src.getRaster.getSample(x, y, 0)
              else {
                val p = src.getRGB(x, y)
                sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff
                sb += p & 0xff; sa += (p >>> 24) & 0xff
              }
              n += 1
              y += 1
            }
            x += 1
          }
          if (gray)
            out.getRaster.setSample(gx, gy, 0, (sr / n).toInt)
          else out.setRGB(gx, gy,
            (((sa / n).toInt & 0xff) << 24) |
              (((sr / n).toInt & 0xff) << 16) |
              (((sg / n).toInt & 0xff) << 8) | ((sb / n).toInt & 0xff))
          gy += 1
        }
        gx += 1
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", buf)
      buf.toByteArray
    }

    /** Perceptual difference hash (dHash) over the DECODED pixels: the
      * image-near-dup primitive (a re-encoded / transcoded copy of the
      * same picture hashes identically; small edits flip few bits, so
      * Hamming distance ranks near-dups — the image twin of SimHash).
      *
      * The downscale to a (size+1)×size luma grid is an INTEGER box
      * average written here by hand — not `Graphics2D` interpolation,
      * whose results could drift across JVMs/platforms; everything in
      * this hash is integer arithmetic over decoder output, so the
      * value is stable enough to anchor in an oracle. Luma is the
      * ITU-R 601 integer form (299·r + 587·g + 114·b, scale 1000 kept —
      * comparisons don't need the division). One bit per horizontal
      * neighbor pair: bit set iff the right cell is brighter. size=8 →
      * 64 bits. */
    def dHash64(id: Long, bytes: Array[Byte], size: Int = 8): Long = {
      require(size >= 1 && size <= 8, s"size in [1,8], got $size")
      // normalize EXIF/TIFF orientation FIRST: a rotated duplicate (the
      // transcoded-portrait/landscape pair every real crawl has) must
      // hash identically to its upright twin — raw stored-raster
      // hashing would put them ~half the bits apart
      val img = reorient(read(id, bytes),
        HeaderCodec.parseOrientation(bytes), grayRaster = false)
      val w = img.getWidth; val h = img.getHeight
      val gw = size + 1
      val cell = Array.ofDim[Long](gw, size)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw
        val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
        var gy = 0
        while (gy < size) {
          val y0 = gy * h / size
          val y1 = math.max(y0 + 1, (gy + 1) * h / size)
          var sum = 0L; var n = 0L
          var x = x0
          while (x < x1 && x < w) {
            var y = y0
            while (y < y1 && y < h) {
              val p = img.getRGB(x, y)
              sum += 299L * ((p >>> 16) & 0xff) +
                587L * ((p >>> 8) & 0xff) + 114L * (p & 0xff)
              n += 1
              y += 1
            }
            x += 1
          }
          cell(gx)(gy) = if (n == 0) 0L else sum / n
          gy += 1
        }
        gx += 1
      }
      var hash = 0L
      var j = 0
      while (j < size) {
        var i = 0
        while (i < size) {
          hash = (hash << 1) |
            (if (cell(i + 1)(j) > cell(i)(j)) 1L else 0L)
          i += 1
        }
        j += 1
      }
      hash
    }
  }

  /** All-pairs perceptual Hamming distances over a (small, distinct)
    * image set: decode executor-side, dHash each payload once, compare
    * every unordered pair. The quadratic stage runs on the DISTINCT
    * image side only (content-addressed, like [[pixelStatsReport]]) —
    * at corpus scale the pairing would go through SimHash-style byte
    * banding on the 64-bit hash instead of all-pairs; this report is
    * the exact-verification harness for that path. */
  def imageDHashPairs(images: DataFrame, nameCol: String = "name",
                      binCol: String = "image",
                      maxHamming: Int = 64,
                      maxImages: Int = 512): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    // This report is the ALL-PAIRS verification harness — quadratic by
    // design. It is SQL-reachable (graft_report), so the bounded-set
    // precondition must be ENFORCED, not just documented: a user pointing
    // it at a corpus-scale image table would get O(n^2) pairing plus a
    // driver broadcast of every hash. The probe reads AT MOST
    // maxImages+1 rows (limit-then-count — a full count would itself
    // scan the corpus-scale table it exists to refuse) and errors past
    // the bound; the scale path is imageNearDups.
    val n = images.select(col(nameCol)).limit(maxImages + 1).count()
    require(n <= maxImages,
      s"image_dhash_pairs is the all-pairs verification harness and is " +
        s"capped at maxImages=$maxImages rows (got more); use " +
        "image_near_dups (banded, never all-pairs) for corpus-scale " +
        "pairing")
    val hashed = images.select(col(nameCol), col(binCol))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (n, b) => (n, PixelCodec.dHash64(0L, b)) })
      .toDF("name", "dhash")
    val a = hashed.select(col("name").as("name_a"), col("dhash").as("ha"))
    val b = hashed.select(col("name").as("name_b"), col("dhash").as("hb"))
    a.join(broadcast(b), col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** The committed image fixtures (REAL container files: the r13 set was
    * python-struct/zlib-built, the r14 BMP/TIFF/WebP set comes from
    * `tools/gen_image_fixtures.py` with documented pixel matrices) as a
    * `(img_key, name, image)` DataFrame — the gate's stand-in for a media
    * corpus's distinct payloads. Lives in MAIN resources so the
    * driver-contract mains (Verify/Bench) can read it, not just tests. */
  object Fixtures {
    /** Fixtures with real pixel data every JDK ImageIO reader decodes —
      * [[PixelCodec]]'s gate surface. (The WebP set is header-only, and
      * progressive_640x480.jpg is a header-only frame with no scan data:
      * both parse in [[HeaderCodec]], refuse in [[PixelCodec]].) */
    val decodable: Seq[String] = Seq(
      "gray_1x1.jpg", "gray_5x7.png", "pixel_1x1.gif", "rgb_3x2.png",
      "rgb_4x3.bmp", "rgb_6x2.tif", "rgba_4x4.png", "topdown_5x4.bmp",
      "wide_300x200.gif", "ycbcr_8x16.jpg")

    def bytes(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/graft/images/$name")
      require(in != null, s"missing committed fixture $name")
      try in.readAllBytes() finally in.close()
    }

    def df(spark: SparkSession): DataFrame = {
      import spark.implicits._
      decodable.zipWithIndex
        .map { case (n, i) => (i.toLong, n, bytes(n)) }
        .toDF("img_key", "name", "image")
    }

    /** Any fixture subset as the same (img_key, name, image) frame —
      * keys are positional within `names`, so gate keying stays stable
      * no matter what other fixtures exist. */
    def dfOf(spark: SparkSession, names: Seq[String]): DataFrame = {
      import spark.implicits._
      names.zipWithIndex
        .map { case (n, i) => (i.toLong, n, bytes(n)) }
        .toDF("img_key", "name", "image")
    }

    /** The rotated-duplicate class (r15): rot90_2x6.tif stores
      * rgb_6x2.tif's picture rotated 90° CCW with TIFF Orientation 6 —
      * losslessly, so orientation-normalized dHash must match the
      * upright original at Hamming 0. Kept OUT of `decodable` so the
      * r14 gate keying (doc_id % 10) is untouched. */
    val oriented: Seq[String] = Seq("rot90_2x6.tif")

    /** Every image fixture [[HeaderCodec]] parses — the `decodable` set
      * plus the header-only class (WebP flavors the JDK cannot pixel-
      * decode; a progressive JPEG frame header with no scan data) plus
      * the oriented twin. The q35 header-prune gate's full surface. */
    val headerParsable: Seq[String] = Seq(
      "alpha_12x5.webp", "extended_640x360.webp", "gray_1x1.jpg",
      "gray_5x7.png", "lossless_33x21.webp", "lossy_17x9.webp",
      "pixel_1x1.gif", "progressive_640x480.jpg", "rgb_3x2.png",
      "rgb_4x3.bmp", "rgb_6x2.tif", "rgba_4x4.png", "rot90_2x6.tif",
      "topdown_5x4.bmp", "wide_300x200.gif", "ycbcr_8x16.jpg")
  }

  /** The shared content-addressed scaffold behind [[pixelStatsReport]],
    * [[Media.audioStatsReport]] and [[Media.videoHeaderReport]]: per-key
    * row counts from the (100 TB) corpus side, broadcast-joined to the
    * decoded distinct-payload frame — decode cost follows distinct
    * media, not rows, the same reason content-addressed storage dedups
    * before transcoding. Output is (outKey, name, n_docs, <stats…> in
    * the decoded frame's order). The broadcast is the small-distinct-side
    * case; at scale the join degrades to shuffle with identical
    * semantics. */
  private[graft] def contentAddressedJoin(df: DataFrame, keyCol: String,
      decoded: DataFrame, outKey: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("long").as(outKey))
      .agg(count(lit(1)).cast("long").as("n_docs"))
    val rest = decoded.columns.filterNot(c => c == outKey || c == "name")
    counts.join(broadcast(decoded), Seq(outKey))
      .select(col(outKey) +: col("name") +: col("n_docs") +:
        rest.map(col).toSeq: _*)
  }

  /** Content-addressed pixel-decode audit: REAL pixel decode of each
    * DISTINCT payload exactly once (executor-side mapPartitions), stats
    * joined to corpus row counts via [[contentAddressedJoin]]. Means are
    * 4-dp rounded; channels a payload lacks are NULL. With `resizeTo`,
    * each payload first runs the full [[PixelCodec.resizePng]] pipeline
    * (decode → integer box filter → lossless PNG encode → decode) and
    * the reported stats are of the RESIZED image — the end-to-end check
    * of the training-input normalization stage. */
  def pixelStatsReport(df: DataFrame, keyCol: String, images: DataFrame,
                       imgKeyCol: String = "img_key",
                       nameCol: String = "name",
                       binCol: String = "image",
                       resizeTo: Option[(Int, Int)] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val decoded = images
      .select(col(imgKeyCol).cast("long"), col(nameCol), col(binCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (k, name, bytes0) =>
        val bytes = resizeTo match {
          case Some((rw, rh)) => PixelCodec.resizePng(k, bytes0, rw, rh)
          case None => bytes0
        }
        val st = PixelCodec.decodeStats(k, bytes)
        def m(i: Int): Option[Double] =
          if (i < st.channels)
            Some(math.round(st.means(i) * 10000).toDouble / 10000)
          else None
        (k, name, st.width, st.height, st.channels, m(0), m(1), m(2), m(3))
      })
      .toDF("img_key", "name", "width", "height", "channels",
        "mean_1", "mean_2", "mean_3", "mean_4")
    contentAddressedJoin(df, keyCol, decoded, "img_key")
  }

  /** Content-addressed HEADER metadata report: dims/channels parsed
    * straight from each DISTINCT payload's container header (REAL bytes,
    * no pixel decode, no image library) joined to corpus row counts —
    * the stage-ONE prune of a 100 TB media pipeline (dimension/aspect/
    * format filters run here; only survivors reach [[PixelCodec]]).
    * Covers the header-only classes pixel decode rightly refuses
    * (JDK-undecodable WebP, scanless progressive JPEG). */
  def headerMetaReport(df: DataFrame, keyCol: String, images: DataFrame,
                       imgKeyCol: String = "img_key",
                       nameCol: String = "name",
                       binCol: String = "image"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val decoded = images
      .select(col(imgKeyCol).cast("long"), col(nameCol), col(binCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (k, name, b) =>
        val m = HeaderCodec.decodeImage(k, b)
        (k, name, m.n_bytes, m.width, m.height, m.channels)
      })
      .toDF("img_key", "name", "n_bytes", "width", "height", "channels")
    contentAddressedJoin(df, keyCol, decoded, "img_key")
  }

  /** Corpus-scale image near-dup pairing: collapse repeated
    * (name, payload) rows FIRST (the content-address step — decode cost
    * follows distinct media, not rows), dHash each survivor once, then
    * BANDED Hamming pairing through [[Dedup.hamming64NearDups]] — never
    * all-pairs; candidates come from shared 16-bit bands of the
    * perceptual hash, recall is pigeonhole-complete for maxHamming ≤ 3.
    * Distinct payloads sharing a name both hash (the caller's key
    * discipline, as with every per-document operator).
    * [[imageDHashPairs]] is this path's exact-verification harness
    * (complete all-pairs ground truth on a bounded set). Returns
    * (id_a, id_b, hamming: long). */
  def imageNearDups(images: DataFrame, nameCol: String = "name",
                    binCol: String = "image",
                    maxHamming: Int = 3): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    val hashed = images.select(col(nameCol), col(binCol))
      .dropDuplicates(nameCol, binCol)
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (n, b) => (n, PixelCodec.dHash64(0L, b)) })
      .toDF("name", "dhash")
    graft.operators.Dedup.hamming64NearDups(hashed, "name", "dhash",
        maxHamming)
      // long like imageDHashPairs, so the equivalent reports union/compare
      .withColumn("hamming", col("hamming").cast("long"))
  }

  /** Decode / feature-extract: batched per-partition map over the binary
    * column (the Scala analogue of `mapInPandas` — one iterator pass per
    * partition, no per-row task overhead, decode parallelism = partitions). */
  def decodeImages(spark: SparkSession, df: DataFrame,
                   idCol: String = "doc_id", binCol: String = "image",
                   codec: ImageCodec = HeaderCodec): Dataset[ImageMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => codec.decodeImage(id, bytes) })
  }

  /** Frame-sampling plumbing for "video": slice the payload into fixed-size
    * frames and keep every `stride`-th — shows the explode-with-metadata shape
    * a video pipeline needs (frame_idx carried alongside the bytes). */
  def sampleFrames(df: DataFrame, binCol: String = "image",
                   frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val nFrames = floor(length(col(binCol)) / frameBytes).cast("int")
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
      .withColumn("frame", col(binCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .drop(binCol)
  }

  /** Block-level dedup estimate — the "what would content-addressed
    * storage save?" pre-flight for a multimodal corpus: payloads split
    * into fixed-size chunks, chunks hashed, and the report says how much
    * of the chunk volume is duplicated (shared headers, repeated frames,
    * re-uploaded assets — all invisible to whole-file hashing the moment
    * one byte differs). One row: doc/chunk totals, distinct chunks, the
    * dedup ratio, and the hottest chunk's occurrence count (a
    * boilerplate-block tell). Fixed-size chunking understates savings vs
    * content-defined boundaries when content SHIFTS (an insertion
    * re-phases every later chunk) — the documented trade for an
    * engine-replayable report; the numbers are a LOWER bound on CDC-style
    * savings.
    *
    * One explode pass (corpus → chunk hashes) and two aggregations; the
    * distinct count is the only value-set shuffle, same contract as an
    * exact distinct. Works on string payloads (char-positional, the
    * oracle-checked form) — binary payloads chunk identically through the
    * same `substr`. */
  def chunkDedupReport(df: DataFrame, payloadCol: String,
                       chunkSize: Int = 256): DataFrame = {
    require(chunkSize >= 1, "chunkSize >= 1")
    val chunks = df
      .filter(col(payloadCol).isNotNull && length(col(payloadCol)) > 0)
      .select(explode(transform(
        sequence(lit(1), length(col(payloadCol)), lit(chunkSize)),
        i => graft.functions.Hashes.portableHash32(
          col(payloadCol).substr(i, lit(chunkSize))))).as("h"))
      .localCheckpoint() // feeds totals AND the per-hash counts
    val perHash = chunks.groupBy("h").agg(count(lit(1)).as("c"))
    val docs = df.filter(col(payloadCol).isNotNull &&
      length(col(payloadCol)) > 0).agg(count(lit(1)).as("n_docs"))
    docs.crossJoin(broadcast(perHash.agg(
        count(lit(1)).as("n_distinct"), sum(col("c")).as("n_chunks"),
        max(col("c")).as("top_count"))))
      .select(col("n_docs").cast("long").as("n_docs"),
        col("n_chunks").cast("long").as("n_chunks"),
        col("n_distinct").cast("long").as("n_distinct_chunks"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_chunks"), 6)
          .as("dedup_ratio"),
        col("top_count").cast("long").as("top_chunk_count"))
  }

  /** [[chunkDedupReport]]'s content-defined sibling: chunk boundaries come
    * from the gear rolling hash ([[graft.functions.CdcChunkHashes]]), so an
    * insertion re-phases only the chunks up to the next content boundary —
    * the savings this report finds are the ones fixed-size chunking
    * provably misses on shifted content, and the pair of reports brackets
    * the real dedup opportunity from below and from (nearly) above.
    * Expected chunk size ≈ 2^maskBits bytes between [minSize, maxSize].
    * NOT SQL-expressible (per-byte rolling state) — the driver records a
    * rows-only check; value correctness is spec-anchored
    * (the q217 DeflateRatio precedent). Same plan shape as the fixed-size
    * report: one explode pass, two aggregations. */
  def cdcChunkDedupReport(df: DataFrame, payloadCol: String,
                          minSize: Int = 16, maskBits: Int = 6,
                          maxSize: Int = 256): DataFrame = {
    graft.functions.TextHashFunctions.register(df.sparkSession)
    val chunks = df
      .filter(col(payloadCol).isNotNull && length(col(payloadCol)) > 0)
      .select(explode(graft.functions.TextHashFunctions.cdcChunkHashes(
        col(payloadCol), minSize, maskBits, maxSize)).as("h"))
      .localCheckpoint()
    val perHash = chunks.groupBy("h").agg(count(lit(1)).as("c"))
    val docs = df.filter(col(payloadCol).isNotNull &&
      length(col(payloadCol)) > 0).agg(count(lit(1)).as("n_docs"))
    docs.crossJoin(broadcast(perHash.agg(
        count(lit(1)).as("n_distinct"), sum(col("c")).as("n_chunks"),
        max(col("c")).as("top_count"))))
      .select(col("n_docs").cast("long").as("n_docs"),
        col("n_chunks").cast("long").as("n_chunks"),
        col("n_distinct").cast("long").as("n_distinct_chunks"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_chunks"), 6)
          .as("dedup_ratio"),
        col("top_count").cast("long").as("top_chunk_count"))
  }
}
