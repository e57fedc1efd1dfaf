package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-hashing pipelines (shingles, MinHash,
  * SimHash).
  *
  * The higher-order-function formulations ([[graft.operators.Dedup]]'s
  * original `transform`/`aggregate`/`zip_with` pipelines) evaluate their
  * lambda bodies through the Catalyst interpreter per array element — at
  * 10^10 documents x 10^2 shingles that per-element interpreter overhead
  * dominates the scan. These expressions compute the identical values in
  * tight JVM code over `UTF8String`, using the exact same primitives the
  * builtin expressions codegen to (`UTF8String.toLowerCase/trim/split/
  * concatWs`, md5 of the UTF-8 bytes), so every DuckDB oracle that mirrored
  * the HOF formulation stays bit-for-bit valid (TextHashParitySpec proves
  * it against the original pipelines).
  *
  * Codegen: the row-level loop stays inside whole-stage codegen via an
  * `addReferenceObj` call into [[TextHashExpression.compute]] — no
  * interpreted-projection fallback, no per-element Catalyst eval, no
  * UDF-style converter boxing (the method takes `UTF8String`, returns
  * `ArrayData`/`Long` directly).
  */
abstract class TextHashExpression extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)

  /** The whole per-row computation; shared verbatim by eval and codegen. */
  def compute(s: UTF8String): Any

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val ref = ctx.addReferenceObj("graftTextHash", this,
      classOf[TextHashExpression].getName)
    val javaT = CodeGenerator.javaType(dataType)
    // compute() returns Object; a primitive-typed expression (LongType ->
    // `long`) cannot cast Object -> long directly in generated Java — it
    // must go through the boxed type and unbox. A direct `(long) obj` cast
    // fails janino compilation and silently drops the whole stage out of
    // codegen (observed as CodeGenerator "Cannot cast Object to long"
    // fallback warnings on every graft_simhash query).
    if (CodeGenerator.isPrimitiveType(dataType)) {
      val boxed = CodeGenerator.boxedType(dataType)
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = (($boxed) $ref.compute($a)).${javaT}Value();")
    } else {
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = ($javaT) $ref.compute($a);")
    }
  }
}

object TextHashExpression {
  private val splitPattern = UTF8String.fromString("\\s+")
  private val space = UTF8String.fromString(" ")

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** `split(trim(lower(text)), "\\s+")` with the builtins' own UTF8String
    * primitives (same lowercase tables, same space-only trim, same regex
    * split) — parity is by construction, not by reimplementation. */
  def tokensOf(s: UTF8String): Array[UTF8String] =
    s.toLowerCase.trim.split(splitPattern, -1)

  /** Word k-shingles joined with " "; fewer than k tokens -> empty. */
  def shinglesOf(toks: Array[UTF8String], k: Int): Array[UTF8String] = {
    val n = toks.length
    if (n < k) return Array.empty
    val out = new Array[UTF8String](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = UTF8String.concatWs(space, java.util.Arrays.copyOfRange(toks, i, i + k): _*)
      i += 1
    }
    out
  }

  /** [[Hashes.portableHash32]]: first 4 md5 bytes of the UTF-8 encoding as
    * an unsigned 32-bit value (== conv(substring(md5(s),1,8),16,10)). */
  def hash32(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 8 md5 digest bytes as a signed big-endian long (64-bit internal
    * key space; see [[ShingleHashes64]]). */
  def hash64(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** ALL 16 md5 digest bytes as two big-endian longs — word 0 is
    * [[hash64]] verbatim (hex chars 1-16), word 1 the remaining 8 bytes
    * (hex chars 17-32). The 128-bit token hash behind [[SimHashSig128]]. */
  def hash128(s: UTF8String): (Long, Long) = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h0 = 0L; var h1 = 0L
    var i = 0
    while (i < 8) { h0 = (h0 << 8) | (d(i) & 0xffL); i += 1 }
    while (i < 16) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    (h0, h1)
  }
}

/** `array<string>` of word k-shingles (the HOF `Dedup.shingles` semantics). */
case class Shingles(child: Expression, k: Int) extends TextHashExpression {
  require(k > 0, "k must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def compute(s: UTF8String): Any = {
    val sh = TextHashExpression.shinglesOf(TextHashExpression.tokensOf(s), k)
    new GenericArrayData(sh.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long>` portableHash32 per k-shingle (ordered, duplicates kept). */
case class ShingleHashes(child: Expression, k: Int) extends TextHashExpression {
  require(k > 0, "k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def compute(s: UTF8String): Any = {
    val sh = TextHashExpression.shinglesOf(TextHashExpression.tokensOf(s), k)
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = TextHashExpression.hash32(sh(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long>` 64-bit hash per k-shingle: the FIRST 8 md5 digest bytes
  * (big-endian, signed). INTERNAL join/verify keys only — never
  * oracle-mirrored: 32-bit keys expect ~1 collision per 10^5 distinct
  * shingles, 64-bit pushes that to ~1e-8 per 10^6, and the operators using
  * these keys either reject collision-induced candidates by exact
  * verification or tolerate them as an extra candidate pair. */
case class ShingleHashes64(child: Expression, k: Int) extends TextHashExpression {
  require(k > 0, "k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes64"

  override def compute(s: UTF8String): Any = {
    val sh = TextHashExpression.shinglesOf(TextHashExpression.tokensOf(s), k)
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = TextHashExpression.hash64(sh(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature: elementwise minima of the [[Hashes.mixConstants]]
  * affine family over the shingle hashes; all-MixP sentinel when the doc has
  * no shingles (the HOF `Dedup.minHashSignature` semantics). */
case class MinHashSig(child: Expression, numHashes: Int, k: Int)
    extends TextHashExpression {
  require(numHashes > 0 && k > 0, "numHashes and k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val mixA = Hashes.mixConstants(numHashes).map(_._1).toArray
  @transient private lazy val mixB = Hashes.mixConstants(numHashes).map(_._2).toArray

  override def compute(s: UTF8String): Any = {
    val sh = TextHashExpression.shinglesOf(TextHashExpression.tokensOf(s), k)
    val sig = Array.fill(numHashes)(Hashes.MixP)
    var i = 0
    while (i < sh.length) {
      val h = TextHashExpression.hash32(sh(i))
      var j = 0
      while (j < numHashes) {
        val m = (mixA(j) * h + mixB(j)) % Hashes.MixP
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 32-bit SimHash over word tokens: bit j set when the sum over tokens of
  * (+1 if the token hash's bit j is set else -1) is positive (the HOF
  * `Dedup.simHash` semantics). */
case class SimHashSig(child: Expression) extends TextHashExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def compute(s: UTF8String): Any = {
    val toks = TextHashExpression.tokensOf(s)
    val votes = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = TextHashExpression.hash32(toks(i))
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over word tokens — [[SimHashSig]]'s scale twin: bit j of
  * the signature votes on bit j of the token's 64-bit md5-prefix hash
  * ([[TextHashExpression.hash64]]). Twice the signature width means bands
  * can be 16 bits wide instead of 8 while keeping the same pigeonhole
  * guarantee, which is what keeps banded candidate generation sub-quadratic
  * on corpora whose 32-bit signatures concentrate (measured: the 32-bit
  * byte-band path generated ~n^2/10 candidates on the synthetic corpus at
  * 50k docs — see PLANS.md scale-proof notes). */
case class SimHashSig64(child: Expression) extends TextHashExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def compute(s: UTF8String): Any = {
    val toks = TextHashExpression.tokensOf(s)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = TextHashExpression.hash64(toks(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 128-bit SimHash over word tokens as `array<bigint>` [w0, w1] — the
  * band-saturation escape hatch for corpora past ~10⁵-10⁶ signatures per
  * dedup group, where the 64-bit engine's 2^16-bucket bands saturate
  * (expected load ≥ 0.76/bucket at 50k docs — SCALEPROBE_r15 measured the
  * singleton-filter benefit decaying 93%→53% over one decade for exactly
  * this reason). 128 bits carry 5 bands of 25-26 bits = 2^25-2^26 buckets
  * per band: uniform-signature candidate expectation drops ~2^9-2^10×
  * versus the 16-bit bands at the same corpus size, pushing the
  * saturation point out by three decades (~10⁸-10⁹ sigs/group).
  *
  * Semantics mirror [[SimHashSig64]] exactly, just wider: bit j of word w
  * votes on bit j of the token's md5 word w ([[TextHashExpression.hash128]]
  * — word 0 is hash64 verbatim, so bits 0-63 of this signature EQUAL the
  * 64-bit signature; the DuckDB oracle replays both words from the md5
  * hex). Ties (vote sum 0) clear the bit, as in the 32/64-bit twins. */
case class SimHashSig128(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simhash128"

  override def compute(s: UTF8String): Any = {
    val toks = TextHashExpression.tokensOf(s)
    val votes = new Array[Int](128)
    var i = 0
    while (i < toks.length) {
      val (h0, h1) = TextHashExpression.hash128(toks(i))
      var j = 0
      while (j < 64) {
        if (((h0 >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        if (((h1 >>> j) & 1L) == 1L) votes(64 + j) += 1 else votes(64 + j) -= 1
        j += 1
      }
      i += 1
    }
    var w0 = 0L; var w1 = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) w0 |= (1L << j)
      if (votes(64 + j) > 0) w1 |= (1L << j)
      j += 1
    }
    new GenericArrayData(Array(w0, w1))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word k-shingles over an ALREADY-TOKENIZED `array<string>` — the
  * [[Shingles]] semantics minus the trim/lower/split pass, for callers
  * that probe SEVERAL ks over one corpus and tokenize once (the r17 q326
  * probe re-tokenized the corpus per k). Value identity with
  * [[Shingles]] is by construction: [[TextHashExpression.shinglesOf]] is
  * shared verbatim, and `shinglesOf(toks, 1)` returns the tokens
  * themselves (concatWs of a single element), so the k=1 case equals the
  * word array. */
case class ShinglesFromTokens(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0, "k must be positive")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles_from_tokens"

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sh = TextHashExpression.shinglesOf(toks, k)
    new GenericArrayData(sh.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftShinglesFromTokens", this,
      classOf[ShinglesFromTokens].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One greedy left-to-right BPE merge pass: every adjacent (a, b) token
  * pair collapses to the concatenation `ab`, non-overlapping (after a
  * merge, scanning resumes AFTER the merged token — "aaa" under (a,a)
  * yields ["aa", "a"], the reference BPE application rule). One round of
  * the trainer loop [[graft.operators.Corpus.bpeLearn]] applies per
  * vocabulary row; the loop stays in whole-stage codegen through the same
  * addReferenceObj route as [[TextHashExpression]]. */
case class BpeMergeOnce(child: Expression, a: UTF8String, b: UTF8String)
    extends UnaryExpression with ExpectsInputTypes {
  // Seq is covariant, so Seq[DataType] satisfies ExpectsInputTypes
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge"

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur.equals(a) && arr.getUTF8String(i + 1).equals(b)) {
        out += UTF8String.concat(a, b)
        i += 2
      } else {
        out += cur
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpeMerge", this,
      classOf[BpeMergeOnce].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashFunctions {
  private def intOf(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  def register(spark: SparkSession): Unit = {
    Registry.ensure(spark, "graft_shingles")(
      es => Shingles(es(0), intOf(es(1))))
    Registry.ensure(spark, "graft_shingles_from_tokens")(
      es => ShinglesFromTokens(es(0), intOf(es(1))))
    Registry.ensure(spark, "graft_shingle_hashes")(
      es => ShingleHashes(es(0), intOf(es(1))))
    Registry.ensure(spark, "graft_shingle_hashes64")(
      es => ShingleHashes64(es(0), intOf(es(1))))
    Registry.ensure(spark, "graft_minhash_sig")(
      es => MinHashSig(es(0), intOf(es(1)), intOf(es(2))))
    Registry.ensure(spark, "graft_simhash")(
      es => SimHashSig(es(0)))
    Registry.ensure(spark, "graft_simhash64")(
      es => SimHashSig64(es(0)))
    Registry.ensure(spark, "graft_simhash128")(
      es => SimHashSig128(es(0)))
    Registry.ensure(spark, "graft_normalize_text")(
      es => NormalizeText(es(0)))
    Registry.ensure(spark, "graft_deflate_ratio")(
      es => DeflateRatio(es(0)))
    Registry.ensure(spark, "graft_cdc_chunks")(es => CdcChunkHashes(es(0),
      es(1).eval(null).asInstanceOf[Number].intValue(),
      es(2).eval(null).asInstanceOf[Number].intValue(),
      es(3).eval(null).asInstanceOf[Number].intValue()))
    Registry.ensure(spark, "graft_bpe_merge")(es => BpeMergeOnce(es(0),
      es(1).eval(null).asInstanceOf[UTF8String],
      es(2).eval(null).asInstanceOf[UTF8String]))
  }

  /** Column builders self-register against the active session (these are
    * always constructed on the driver while a session is active). */
  private def ensure(): Unit = register(SparkSession.active)

  def shingles(text: Column, k: Int): Column =
    { ensure(); call_function("graft_shingles", text, lit(k)) }
  def shinglesFromTokens(tokens: Column, k: Int): Column =
    { ensure(); call_function("graft_shingles_from_tokens", tokens, lit(k)) }
  def shingleHashes(text: Column, k: Int): Column =
    { ensure(); call_function("graft_shingle_hashes", text, lit(k)) }
  def shingleHashes64(text: Column, k: Int): Column =
    { ensure(); call_function("graft_shingle_hashes64", text, lit(k)) }
  def minHashSig(text: Column, numHashes: Int, k: Int): Column =
    { ensure(); call_function("graft_minhash_sig", text, lit(numHashes), lit(k)) }
  def simHash(text: Column): Column =
    { ensure(); call_function("graft_simhash", text) }
  def simHash64(text: Column): Column =
    { ensure(); call_function("graft_simhash64", text) }
  def simHash128(text: Column): Column =
    { ensure(); call_function("graft_simhash128", text) }
  def normalizeText(text: Column): Column =
    { ensure(); call_function("graft_normalize_text", text) }
  def deflateRatio(text: Column): Column =
    { ensure(); call_function("graft_deflate_ratio", text) }
  def cdcChunkHashes(text: Column, minSize: Int, maskBits: Int,
                     maxSize: Int): Column =
    { ensure(); call_function("graft_cdc_chunks", text, lit(minSize),
      lit(maskBits), lit(maxSize)) }
  def bpeMergeOnce(tokens: Column, a: String, b: String): Column =
    { ensure(); call_function("graft_bpe_merge", tokens, lit(a), lit(b)) }
}
