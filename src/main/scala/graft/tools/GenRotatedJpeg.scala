package graft.tools

/** One-shot deterministic generator for the committed rotated-JPEG twin
  * fixtures (`rotpair_32x16.jpg` / `rotpair_16x32.jpg`) — the JPEG member
  * of the q314 rotated-duplicate gate (the TIFF pair rgb_6x2/rot90_2x6
  * proves the TIFF IFD path; these prove the JPEG APP1 path with a real
  * committed file, not just the spec-built in-memory one).
  *
  * Why a LOSSY format can still pair at Hamming 0: the image is gray and
  * CONSTANT on every 8×8 JPEG block, and both dims are multiples of 8 — a
  * 90° rotation then maps whole blocks to whole blocks, and baseline JPEG
  * codes each block independently (DC differences are coded losslessly),
  * so a block with value v decodes to the same f(v) wherever it sits.
  * decode(rotated file) is therefore EXACTLY rotate(decode(upright file)),
  * and the orientation-normalized dHash/rasters are bit-identical.
  * Quality 1.0 keeps f(v) = v in practice, but the twin equality does not
  * depend on it. Block values are the documented formula below;
  * CdcMultimodalSpec decoder-anchors the resulting dHash constants that
  * the q314 oracle pins.
  *
  * Usage: sbt "runMain graft.tools.GenRotatedJpeg src/main/resources/graft/images"
  */
object GenRotatedJpeg {
  private val W = 32; private val H = 16 // upright displayed dims

  /** Block value at block coords (bx, by): 25 + 25·(by·4 + bx) ∈ [25, 200]
    * — all eight 8×8 blocks distinct, asymmetric under every flip, so the
    * dHash carries real structure in both axes. */
  private def blockVal(bx: Int, by: Int): Int = 25 + 25 * (by * 4 + bx)

  private def encodeGrayJpeg(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(x, y))
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    out.toByteArray
  }

  /** APP1 Exif segment carrying a big-endian TIFF with the single
    * Orientation (0x0112) SHORT entry — the minimal real camera layout. */
  private def exifApp1(orientation: Int): Array[Byte] = {
    val tiff = "Exif".getBytes ++ Array[Byte](0, 0) ++
      Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8, 0, 1) ++
      Array[Byte](0x01, 0x12, 0, 3, 0, 0, 0, 1,
        (orientation >>> 8).toByte, orientation.toByte, 0, 0) ++
      Array[Byte](0, 0, 0, 0)
    val len = tiff.length + 2
    Array(0xff.toByte, 0xe1.toByte, (len >>> 8).toByte, len.toByte) ++ tiff
  }

  def upright(): Array[Byte] =
    encodeGrayJpeg(W, H, (x, y) => blockVal(x / 8, y / 8))

  /** Stored-rotated twin under EXIF orientation 6: displayed (x, y) reads
    * stored (y, h−1−x), so stored (sx, sy) = upright (W−1−sy, sx). */
  def rotated(): Array[Byte] = {
    val jpeg = encodeGrayJpeg(H, W,
      (sx, sy) => blockVal((W - 1 - sy) / 8, sx / 8))
    jpeg.take(2) ++ exifApp1(6) ++ jpeg.drop(2)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: GenRotatedJpeg <outDir>")
    val dir = new java.io.File(args(0)); require(dir.isDirectory, s"$dir")
    java.nio.file.Files.write(
      new java.io.File(dir, "rotpair_32x16.jpg").toPath, upright())
    java.nio.file.Files.write(
      new java.io.File(dir, "rotpair_16x32.jpg").toPath, rotated())
    println(s"wrote rotpair_32x16.jpg (${upright().length} B) and " +
      s"rotpair_16x32.jpg (${rotated().length} B) to $dir")
  }
}
