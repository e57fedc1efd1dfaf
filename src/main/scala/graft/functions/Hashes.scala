package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash helpers used across dedup / PII / merge-bucketing.
  *
  * `portableHash32` is deliberately md5-based (not Spark's murmur3 `hash()`)
  * so that every derived operator — MinHash signatures, SimHash bits, merge
  * bucket keys — is reproducible in any engine with an md5 function. That is
  * what lets the DuckDB oracle check these operators bit-for-bit. At scale the
  * cost difference vs murmur3 is irrelevant next to the shuffle the hash
  * feeds; both are codegen'd builtins.
  */
object Hashes {

  /** Deterministic 32-bit-range non-negative hash of a string: the first 8 hex
    * chars of md5 parsed as an unsigned int (0 .. 2^32-1, fits in LongType).
    */
  def portableHash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded variant: independent hash families for MinHash (seed is mixed into
    * the md5 preimage, not xor'd after, so families are truly independent).
    */
  def seededHash(c: Column, seed: Int): Column =
    portableHash32(concat(lit(s"$seed:"), c))

  /** (x * c) mod 2^32 without 64-bit overflow: split x into 16-bit halves
    * so every intermediate stays ≤ ~2^48 — BIGINT-safe in engines that
    * CHECK overflow (DuckDB errors where the JVM would silently wrap). */
  private def mulMod32(x: Column, c: Long): Column =
    ((x % 65536L) * c + ((shiftright(x, 16) * c) % 65536L) * 65536L) %
      4294967296L

  /** Portable murmur3 fmix32 avalanche over a 32-bit value carried in a
    * long: every operation (xor, shift, split multiply mod 2^32) has
    * bit-identical semantics in Spark and DuckDB SQL, so derived
    * pseudo-randomness (e.g. per-replicate bootstrap weights) replays
    * exactly in the oracle — at integer-codegen cost instead of an md5
    * per derivation. Feed it `portableHash32(id) ^ (k * oddConst mod
    * 2^32)` to fan one md5 into k decorrelated streams. */
  def portableMix32(x: Column): Column = {
    val a = mulMod32(x.bitwiseXOR(shiftright(x, 16)), 2246822507L)
    val b = mulMod32(a.bitwiseXOR(shiftright(a, 13)), 3266489909L)
    b.bitwiseXOR(shiftright(b, 16))
  }

  /** Driver-side twin of [[portableHash32]] for building small deterministic
    * control-plane structures (random-projection sign matrices, salt maps)
    * that the DuckDB oracle can replay with the same md5 formula. */
  def portableHash32Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** Reference `hashNumericalIt` (reference M/utility/Utility.scala:61-64):
    * bucket key `abs(hash(concat(cols))) % buckets` appended to merge join keys
    * to prune the merge join. We keep the semantics but use the portable hash
    * so the oracle can verify it; bucket count stays configurable (ref: 500).
    */
  def groupingKey(cols: Seq[Column], buckets: Int = 500): Column =
    pmod(portableHash32(concat_ws("|", cols.map(_.cast("string")): _*)), lit(buckets.toLong))

  /** Affine MinHash mixing family over a base 32-bit hash:
    * `mix_i(h) = (a_i * h + b_i) mod P`. All intermediates stay below 2^62,
    * so the identical arithmetic runs overflow-free in any 64-bit engine
    * (DuckDB raises on BIGINT overflow rather than wrapping). One md5 per
    * shingle + n multiplies replaces n md5 passes. */
  val MixP: Long = 2147483647L // 2^31 - 1 (prime)

  /** Deterministic per-family (a, b) constants; a odd, both < 2^30. */
  def mixConstants(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val a = ((i * 2654435761L + 1013904223L) % 1073741789L) | 1L
      val b = (i * 1540483477L + 37L) % 1073741789L
      (a, b)
    }
}
