package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Record-linkage string similarity as native codegen expressions.
  *
  * Jaro-Winkler and (unrestricted) Damerau-Levenshtein — the two standard
  * scorers for fuzzy entity matching that Spark's builtin surface lacks
  * (it ships only `levenshtein`/`soundex`). Both operate on the UTF-8
  * BYTES of the input, matching DuckDB's byte-based semantics exactly
  * (verified: 'üben' vs 'uben' scores over 5-vs-4 byte strings, boost
  * threshold 0.7 strict, prefix cap 4) so the oracle can replay them with
  * its builtin `jaro_winkler_similarity` / `damerau_levenshtein`.
  *
  * Scale contract: both are O(|a|·|b|) per pair in time (DL also in
  * memory) — they are verification scorers for short keys (names, titles,
  * normalized addresses) AFTER a blocking stage has cut the pair space
  * (see [[graft.operators.Dedup.recordLinkagePairs]]), never all-pairs
  * scorers over raw text. The row loop stays inside whole-stage codegen
  * via an `addReferenceObj` static call, same route as
  * [[TextHashExpression]].
  */
abstract class StringPairExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  /** Whole per-row computation over UTF-8 bytes; shared by eval + codegen. */
  def compute(a: UTF8String, b: UTF8String): Any

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftStringSim", this,
      classOf[StringPairExpression].getName)
    val javaT = CodeGenerator.javaType(dataType)
    // primitive result types must unbox through the boxed type — a direct
    // `(double) obj` cast fails janino and drops the stage out of codegen
    if (CodeGenerator.isPrimitiveType(dataType)) {
      val boxed = CodeGenerator.boxedType(dataType)
      nullSafeCodeGen(ctx, ev,
        (a, b) => s"${ev.value} = (($boxed) $ref.compute($a, $b)).${javaT}Value();")
    } else {
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = ($javaT) $ref.compute($a, $b);")
    }
  }
}

object StringSimilarity {

  /** Jaro similarity over byte arrays. DuckDB-parity edge cases: either
    * side empty -> 0.0 (INCLUDING both empty), match window
    * `max(|a|,|b|)/2 - 1` floored at 0, transpositions counted as
    * half-swaps over the matched subsequences. */
  def jaro(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the two matched subsequences in order. DuckDB
    // FLOORS the half-count (`t = mismatches / 2` in integer math), so an
    // odd mismatch count scores higher than the textbook t = mismatches/2.0
    // — pinned by the 'dc0dZ' fixture row (3 mismatches -> t = 1).
    var mismatches = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val md = m.toDouble
    (md / la + md / lb + (md - t) / md) / 3.0
  }

  /** Jaro-Winkler: prefix boost (cap 4, scale 0.1) applied only when the
    * Jaro score strictly exceeds 0.7 — DuckDB's exact rule. */
  def jaroWinkler(a: Array[Byte], b: Array[Byte]): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val cap = math.min(4, math.min(a.length, b.length))
    while (l < cap && a(l) == b(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Unrestricted Damerau-Levenshtein (insert/delete/substitute/transpose,
    * transposed blocks may be edited between — 'CA'->'ABC' = 2, not OSA's
    * 3), the textbook `da`-alphabet DP over the 256 byte values. O(|a|·|b|)
    * time AND memory — short-key scorer only. */
  def damerauLevenshtein(a: Array[Byte], b: Array[Byte]): Long = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    // the DP matrix is (|a|+2)·(|b|+2) ints — a pair of 100 KB documents
    // would be a 40 GB allocation. This is a SHORT-KEY scorer (names,
    // titles); fail loudly instead of OOM-killing an executor.
    require(la.toLong * lb <= 16L * 1024 * 1024,
      s"damerau_levenshtein inputs too large ($la x $lb bytes) — " +
        "score short keys after blocking, not raw documents")
    val inf = la + lb
    val da = new Array[Int](256)
    // d is (la+2) x (lb+2); flat row-major
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(b(j - 1) & 0xff)
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da(a(i - 1) & 0xff) = i
      i += 1
    }
    d((la + 1) * w + lb + 1).toLong
  }

  def register(spark: SparkSession): Unit = synchronized {
    Registry.ensure(spark, "graft_jaro_winkler")(
      exprs => JaroWinklerSim(exprs(0), exprs(1)))
    Registry.ensure(spark, "graft_damerau_levenshtein")(
      exprs => DamerauLevenshteinDist(exprs(0), exprs(1)))
  }

  def jaroWinkler(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_jaro_winkler", a, b)
  }

  def damerauLevenshtein(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_damerau_levenshtein", a, b)
  }

  /** Consonant-class code per letter a..z (Soundex's classes; vowels and
    * h/w/y code 0): b f p v→1, c g j k q s x z→2, d t→3, l→4, m n→5, r→6. */
  private val PhoneticCodes = "01230120022455012623010202"

  /** Soundex-style phonetic blocking key: first letter + the first three
    * consonant-class digits of the rest (adjacent same-class runs
    * collapsed, vowel classes dropped), zero-padded to 4 — "large"→l620,
    * "bolt"→b430. Deliberately a DOCUMENTED variant of classic Soundex
    * (no h/w bridging rule, no first-letter-code suppression): every step
    * is a codegen'd builtin (`translate` + per-digit `regexp_replace` —
    * NO backreferences, so the identical chain runs under DuckDB's RE2
    * oracle with the 'g' flag), which is the portability contract the
    * linkage gates need. Null/letterless input → null key. */
  def phoneticKey(name: Column): Column = {
    import org.apache.spark.sql.functions._
    val n = regexp_replace(lower(name), "[^a-z]", "")
    val digits0 = translate(n.substr(lit(2), length(n)),
      "abcdefghijklmnopqrstuvwxyz", PhoneticCodes)
    val collapsed = (1 to 6).foldLeft(digits0) { (c, d) =>
      regexp_replace(c, s"$d+", s"$d")
    }
    val noZero = regexp_replace(collapsed, "0", "")
    when(length(n) === 0, lit(null).cast("string"))
      .otherwise(rpad(concat(n.substr(1, 1), noZero), 4, "0"))
  }
}

/** `double` Jaro-Winkler similarity of two strings (byte-based). */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends StringPairExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override def compute(a: UTF8String, b: UTF8String): Any =
    StringSimilarity.jaroWinkler(a.getBytes, b.getBytes)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `bigint` unrestricted Damerau-Levenshtein distance (byte-based). */
case class DamerauLevenshteinDist(left: Expression, right: Expression)
    extends StringPairExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_damerau_levenshtein"
  override def compute(a: UTF8String, b: UTF8String): Any =
    StringSimilarity.damerauLevenshtein(a.getBytes, b.getBytes)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
