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
