package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: deflated size / raw UTF-8 size of the
  * text — the cheap "is this document mostly template/repetition?" filter
  * modern corpus-curation pipelines run alongside the Gopher rules
  * (highly repetitive pages compress far below natural prose; already-
  * compressed or random content sits near/above 1.0 thanks to the zlib
  * framing overhead). Complements [[graft.operators.TextAnalysis]]'s
  * repetition metrics: those count EXACT n-gram repeats, DEFLATE's LZ77
  * window also catches near-repeats and long-range template echo within
  * 32 KB.
  *
  * Deterministic by construction: fixed level 6, default strategy, no
  * preset dictionary — the same bytes deflate to the same length on every
  * JVM (zlib's output for fixed settings is stable; the JDK bundles
  * zlib). NOT SQL-expressible (DuckDB has no compression scalar), so the
  * gate that rides it takes the driver's rows-only check and correctness
  * is spec-anchored on hand-computable texts instead — the streaming-
  * operator precedent.
  *
  * Scale: one pass, one tight per-row loop inside whole-stage codegen via
  * the [[TextHashExpression]] scaffold; a thread-local Deflater is reset
  * per row, never reallocated. Empty text reports 1.0 (nothing to
  * compress — neutral, not an outlier in either tail). */
case class DeflateRatio(child: Expression) extends TextHashExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override def compute(s: UTF8String): Any = {
    val raw = s.getBytes
    if (raw.isEmpty) 1.0
    else {
      val d = DeflateRatio.local.get()
      d.reset()
      d.setInput(raw)
      d.finish()
      var compressed = 0L
      val buf = DeflateRatio.bufLocal.get()
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length.toDouble
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatio {
  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(6 /* fixed level: determinism is part of the contract */)
  }
  private val bufLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }
}

/** Content-defined chunk hashes — the gear rolling hash (the FastCDC
  * family's core): a boundary is declared where the rolling hash of the
  * last bytes masks to zero, so boundaries are a function of CONTENT, not
  * position. This is exactly what fixed-size chunking
  * ([[graft.operators.Multimodal.chunkDedupReport]]) cannot do: after an
  * insertion the gear hash RE-SYNCS at the next content boundary and every
  * later chunk hashes identically again, while fixed-size chunks stay
  * re-phased forever — the rsync/backup-dedup insight, applied to
  * multimodal payload storage.
  *
  * Deterministic by construction: the 256-entry gear table is md5-derived
  * per byte value (the portable-hash recipe), chunk content hashes are
  * FNV-1a 64. `minSize` suppresses boundary checks inside the first bytes
  * of a chunk (tiny-chunk pathology), `maxSize` forces a cut (mask
  * never matching on adversarial content must not produce unbounded
  * chunks). Returns the array of chunk hashes; the trailing partial chunk
  * is emitted. Sequential per payload by nature — the parallelism unit is
  * the ROW, which is the right grain for a corpus of payloads; the loop
  * runs inside whole-stage codegen via the [[TextHashExpression]]
  * scaffold. */
case class CdcChunkHashes(child: Expression, minSize: Int, maskBits: Int,
                          maxSize: Int) extends TextHashExpression {
  require(minSize >= 1 && maxSize >= minSize, "1 <= minSize <= maxSize")
  require(maskBits >= 1 && maskBits <= 48, "maskBits in [1, 48]")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  private val mask: Long = (1L << maskBits) - 1

  override def compute(s: UTF8String): Any = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + CdcChunkHashes.gear(bytes(i) & 0xff)
      val size = i - start + 1
      if ((size >= minSize && (h & mask) == 0L) || size >= maxSize ||
        i == n - 1) {
        out += CdcChunkHashes.fnv64(bytes, start, i + 1)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunkHashes {
  /** md5-derived 64-bit gear constants, one per byte value. */
  val gear: Array[Long] = Array.tabulate(256) { b =>
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(Array(b.toByte))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** FNV-1a 64 over a byte slice — the chunk's content address. */
  def fnv64(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }
}
