package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

/** Parity of the byte-based Jaro-Winkler / Damerau-Levenshtein expressions
  * against DuckDB's builtins: the fixture below is DuckDB 1.x output
  * (`jaro_winkler_similarity`, `damerau_levenshtein`) over seeded random
  * strings including multi-byte UTF-8, empties, and the classic
  * linkage-literature pairs — regenerate with tools/gen_stringsim_fixture.py.
  * Pins: byte (not codepoint) semantics ('üben' vs 'uben' = 5-vs-4 bytes),
  * 0.7 strict boost threshold, prefix cap 4, both-empty -> 0.0, and the
  * UNRESTRICTED transposition rule ('CA'->'ABC' = 2, not OSA's 3). */
class StringSimilaritySpec extends SparkSpec {

  // (a, b, duckdb jaro_winkler_similarity, duckdb damerau_levenshtein)
  private val fixture: Seq[(String, String, Double, Long)] = Seq(
    ("da hhedc1b", "da hh", 0.9, 5L),
    ("éag", "1h2 af1Y eg", 0.44696969696969696, 9L),
    ("dc0dZ", "Z b2d0cXZgcbh", 0.6192307692307693, 10L),
    ("h", "d0 2ZfZZg cfh", 0.0, 12L),
    (" hYbhb", " hYY0 c", 0.6428571428571429, 4L),
    (" 10Zheéücbd", "f1", 0.5256410256410257, 12L),
    ("02é ad", " YdX1f2a é", 0.45598845598845594, 10L),
    ("dXégeZfé", "aYüadZXhbhccüc", 0.4708333333333334, 13L),
    ("eeüf é1g", "gX0Z2é2dhhcYah", 0.4444444444444445, 14L),
    ("", "b", 0.0, 1L),
    ("bYcéh ügeühü1g", "d", 0.0, 18L),
    ("112bd", "", 0.0, 5L),
    ("dhgg2", "dh1f", 0.6333333333333333, 3L),
    ("c2d", "", 0.0, 3L),
    ("achf1üüg", "achf0bf0", 0.6333333333333333, 6L),
    ("", "bYbbüééfb", 0.0, 12L),
    ("f", "c", 0.0, 1L),
    ("0dh", "bc1éY gYh", 0.0, 9L),
    ("X2", "ca2dc", 0.5666666666666667, 4L),
    (" eZchZXf", " eZcXéaX", 0.836111111111111, 5L),
    ("e", "XgYg", 0.0, 4L),
    (" éü bc1 baYe ", "21", 0.0, 14L),
    ("c", "ebZe1ebXZbZghd", 0.0, 14L),
    ("1ehff1af", "Y1h fd0bühg", 0.5416666666666666, 10L),
    ("ZXhhag0", "ZXh c Z", 0.6190476190476191, 4L),
    ("Yad f bd1ZY1é", "0", 0.0, 14L),
    (" b1", "", 0.0, 3L),
    ("gZ1cYYdXéX1Y", "Xeg10f", 0.49572649572649574, 12L),
    ("MARTHA", "MARHTA", 0.9611111111111111, 1L),
    ("DIXON", "DICKSONX", 0.8133333333333332, 4L),
    ("CA", "ABC", 0.0, 2L),
    ("", "", 0.0, 0L),
    ("a", "", 0.0, 1L),
    ("ab", "ba", 0.0, 1L),
    ("abcdefxxxx", "abcdefyyyy", 0.8400000000000001, 4L),
    ("üben", "uben", 0.7833333333333333, 2L),
    // anagram-heavy pairs (seed 7): odd mismatch counts pin the floored
    // transposition rule — textbook t = mismatches/2.0 fails several
    ("bdaaeace", "aaacedeb", 0.7777777777777778, 6L),
    ("baed", "adeb", 0.6666666666666666, 3L),
    ("eaeeda", "deeaea", 0.8222222222222223, 3L),
    ("eaece", "eceea", 0.76, 3L),
    ("aeaeaebd", "aeeaeadb", 0.9, 3L),
    ("bbaece", "cbbeae", 0.8222222222222223, 3L),
    ("edbc", "ebcd", 0.8500000000000001, 2L),
    ("aee", "aee", 1.0, 0L),
    ("ededaacd", "caddeaed", 0.7777777777777778, 5L),
    ("adcbeada", "aaaedcdb", 0.75, 6L),
    ("abddecbdec", "ddeeadbccb", 0.7833333333333333, 7L),
    ("adebcc", "ccebda", 0.5555555555555555, 4L))

  private def bytes(s: String) = UTF8String.fromString(s).getBytes

  test("jaroWinkler matches DuckDB bit-for-bit on the pinned fixture") {
    for ((a, b, jw, _) <- fixture) {
      val got = StringSimilarity.jaroWinkler(bytes(a), bytes(b))
      assert(got == jw, s"jw('$a','$b'): got $got want $jw")
    }
  }

  test("damerauLevenshtein matches DuckDB on the pinned fixture") {
    for ((a, b, _, dl) <- fixture) {
      val got = StringSimilarity.damerauLevenshtein(bytes(a), bytes(b))
      assert(got == dl, s"dl('$a','$b'): got $got want $dl")
    }
  }

  test("both are symmetric and identity-zero") {
    for ((a, b, _, _) <- fixture) {
      assert(StringSimilarity.jaroWinkler(bytes(a), bytes(b)) ==
        StringSimilarity.jaroWinkler(bytes(b), bytes(a)))
      assert(StringSimilarity.damerauLevenshtein(bytes(a), bytes(b)) ==
        StringSimilarity.damerauLevenshtein(bytes(b), bytes(a)))
      assert(StringSimilarity.damerauLevenshtein(bytes(a), bytes(a)) == 0L)
      if (a.nonEmpty)
        assert(StringSimilarity.jaroWinkler(bytes(a), bytes(a)) == 1.0)
    }
  }

  test("the Column path evaluates through codegen with the same values") {
    import spark.implicits._
    val df = fixture.map(f => (f._1, f._2)).toDF("a", "b")
      .withColumn("jw", StringSimilarity.jaroWinkler(spark, col("a"), col("b")))
      .withColumn("dl", StringSimilarity.damerauLevenshtein(spark, col("a"), col("b")))
    val got = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getDouble(2), r.getLong(3)))
    for (((a, b, jw, dl), (ga, gb, gjw, gdl)) <- fixture.zip(got)) {
      assert((ga, gb) == (a, b))
      assert(gjw == jw, s"column jw('$a','$b')")
      assert(gdl == dl, s"column dl('$a','$b')")
    }
  }

  test("SQL registration exposes both functions") {
    StringSimilarity.register(spark)
    val r = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA','MARHTA') AS jw, " +
        "graft_damerau_levenshtein('CA','ABC') AS dl").head()
    assert(r.getDouble(0) == 0.9611111111111111)
    assert(r.getLong(1) == 2L)
  }

  test("phoneticKey: sound-alikes collide, classic anchors, null on no letters") {
    import spark.implicits._
    val rows = Seq("Robert", "Rupert", "smith", "smyth", "blue", "bolt",
      "large", "42", "a").toDF("w")
      .withColumn("k", StringSimilarity.phoneticKey(col("w")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("Robert") == "r163" && rows("Rupert") == "r163") // classic pair
    assert(rows("smith") == "s530" && rows("smyth") == "s530")
    assert(rows("blue") == "b400" && rows("bolt") == "b430") // NOT merged
    assert(rows("large") == "l620")
    assert(rows("42") == null, "letterless input keys to null")
    assert(rows("a") == "a000", "single letter pads with zeros")
  }
}
