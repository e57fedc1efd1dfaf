package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DeflateRatio has no SQL oracle (DuckDB has no compression scalar), so
  * correctness is anchored here on hand-characterizable inputs — the
  * streaming-operator precedent for non-SQL-expressible surfaces. */
class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(texts: (Long, String)*): Map[Long, Double] =
    texts.toSeq.toDF("id", "text")
      .select(col("id"), TextHashFunctions.deflateRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("repetition compresses far below prose; short/empty text is neutral-high") {
    val template = ("lorem ipsum dolor sit amet " * 100).trim
    val prose = "The quick brown fox jumps over the lazy dog while seventeen " +
      "astronomers catalogued unusual variable stars near the galactic plane, " +
      "each measurement logged with instrument serial numbers and local " +
      "weather notes that never repeat verbatim across observation nights."
    val r = ratios(1L -> template, 2L -> prose, 3L -> "", 4L -> "hi")
    assert(r(1L) < 0.05, s"100x template must crush: ${r(1L)}")
    assert(r(2L) > 0.5 && r(2L) < 1.0, s"prose stays high: ${r(2L)}")
    assert(r(3L) == 1.0)                  // empty: defined neutral
    assert(r(4L) > 1.0, "zlib framing dominates tiny inputs — above 1.0")
    // the ordering the FILTER depends on
    assert(r(1L) < r(2L) && r(2L) < r(4L))
  }

  test("deterministic across invocations and rows (fixed level, no dictionary)") {
    val text = "determinism check " * 40
    val a = ratios(1L -> text, 2L -> text)
    val b = ratios(1L -> text)
    assert(a(1L) == a(2L) && a(1L) == b(1L))
  }

  test("survives with codegen fallback disabled; null stays null") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((1L, Some("abc abc abc abc")), (2L, None))
        .toDF("id", "text")
        .select(col("id"), TextHashFunctions.deflateRatio(col("text")).as("r"))
      val rows = df.collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(rows(1L).exists(_ > 0))
      assert(rows(2L).isEmpty, "null text must not become a ratio")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
