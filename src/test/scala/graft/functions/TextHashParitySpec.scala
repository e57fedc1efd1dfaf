package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native text-hash expressions must be BIT-FOR-BIT equal to the
  * original higher-order-function formulations they replaced — every DuckDB
  * oracle (q19/q20/q21/q22/q38/q46) mirrors the HOF math, so any drift here
  * is a correctness break, not a perf nit. The HOF pipelines live on in this
  * spec as the executable specification. */
class TextHashParitySpec extends SparkSpec {
  import spark.implicits._

  // --- the original HOF formulations (verbatim from Dedup pre-r4) ---------

  private def hofTokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  private def hofShingles(text: Column, k: Int): Column = {
    val toks = hofTokens(text)
    val n = size(toks)
    when(n < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), n - lit(k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  private def hofMinHashSig(text: Column, numHashes: Int, k: Int): Column = {
    val hs = transform(hofShingles(text, k), s => Hashes.portableHash32(s))
    val init = array_repeat(lit(Hashes.MixP), numHashes)
    val mixes = Hashes.mixConstants(numHashes)
    aggregate(hs, init, (acc, h) =>
      zip_with(acc,
        array(mixes.map { case (a, b) => (lit(a) * h + lit(b)) % lit(Hashes.MixP) }: _*),
        (x, y) => least(x, y)))
  }

  private def hofSimHash(text: Column): Column = {
    val hashes = transform(hofTokens(text), t => Hashes.portableHash32(t))
    val bitVotes = aggregate(hashes, array_repeat(lit(0), 32), (acc, h) =>
      zip_with(acc, sequence(lit(0), lit(31)), (v, j) =>
        v + when(call_function("shiftright", h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
    aggregate(
      zip_with(bitVotes, sequence(lit(0), lit(31)),
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  // real corpus plus the edge shapes: empty, whitespace-only, single token,
  // exactly k tokens, tabs/newlines, unicode uppercase, repeated tokens
  private def corpus = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).limit(300)
    docs.union(Seq("", "   ", "one", "one two three", "a\tb\nc  d",
      "ÄÖÜ Straße ΑΒΓ", "x x x x x", " lead trail ").toDF("text"))
  }

  test("Shingles == HOF shingles") {
    val diff = corpus.select(
      TextHashFunctions.shingles(col("text"), 3).as("a"),
      hofShingles(col("text"), 3).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.count() == 0, diff.collect().take(3).mkString("\n"))
  }

  test("ShinglesFromTokens over tokens() == Shingles over text (all ks)") {
    // the r18 multi-k probe contract: deriving k-shingles from a shared
    // word-array pass must be value-identical to shingling the text —
    // including k=1 (the word array itself) and the edge shapes above
    Seq(1, 2, 3, 5, 9).foreach { k =>
      val diff = corpus.select(
        TextHashFunctions.shinglesFromTokens(hofTokens(col("text")), k).as("a"),
        TextHashFunctions.shingles(col("text"), k).as("b"))
        .filter(not(col("a") <=> col("b")))
      assert(diff.count() == 0, s"k=$k: " + diff.collect().take(3).mkString("\n"))
    }
  }

  test("MinHashSig == HOF minhash fold (several n, k)") {
    Seq((8, 3), (4, 2), (16, 5)).foreach { case (n, k) =>
      val diff = corpus.select(
        TextHashFunctions.minHashSig(col("text"), n, k).as("a"),
        hofMinHashSig(col("text"), n, k).as("b"))
        .filter(not(col("a") <=> col("b")))
      assert(diff.count() == 0, s"n=$n k=$k: " + diff.collect().take(3).mkString("\n"))
    }
  }

  test("SimHashSig == HOF simhash") {
    val diff = corpus.select(
      TextHashFunctions.simHash(col("text")).as("a"),
      hofSimHash(col("text")).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.count() == 0, diff.collect().take(3).mkString("\n"))
  }

  test("ShingleHashes == portableHash32 over HOF shingles") {
    val diff = corpus.select(
      TextHashFunctions.shingleHashes(col("text"), 3).as("a"),
      transform(hofShingles(col("text"), 3), s => Hashes.portableHash32(s)).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.count() == 0, diff.collect().take(3).mkString("\n"))
  }

  test("text-hash expressions survive with codegen fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = corpus.select(
        TextHashFunctions.minHashSig(col("text"), 8, 3),
        TextHashFunctions.simHash(col("text")),
        TextHashFunctions.shingles(col("text"), 3),
        TextHashFunctions.shingleHashes(col("text"), 3)).count()
      assert(n > 300)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
