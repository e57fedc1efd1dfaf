package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contamination (n-gram containment) and aligned-window exact-substring
  * candidates — the two cross-corpus leak detectors added in round 5. */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val benchText = (1 to 20).map(i => s"bench$i").mkString(" ")

  test("ngramContainment finds a benchmark doc quoted inside a train doc") {
    val train = Seq(
      (1L, s"leading words then the benchmark $benchText and a tail"),
      (2L, (1 to 40).map(i => s"unrelated$i").mkString(" "))
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val out = Dedup.ngramContainment(train, bench, "text", "doc_id",
      shingleK = 8, threshold = 0.5).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 100L)
    assert(r.getDouble(3) == 1.0) // every bench 8-gram appears in doc 1
  }

  test("ngramContainment containment is |shared|/|bench|, not Jaccard") {
    // train doc shares exactly the first half of the bench doc's tokens:
    // bench has 13 distinct 8-grams (20 tokens), the half-quote covers 3
    val half = (1 to 10).map(i => s"bench$i").mkString(" ")
    val train = Seq((1L, s"$half " + (1 to 200).map(i => s"pad$i").mkString(" ")))
      .toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val out = Dedup.ngramContainment(train, bench, "text", "doc_id",
      shingleK = 8, threshold = 0.0).collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 3L)  // shared 8-grams
    assert(out(0).getDouble(3) == math.rint(3.0 / 13.0 * 10000) / 10000)
  }

  test("sharedWindowPairs catches an aligned duplicated span and skips short docs") {
    val span = "x" * 200 // long enough to cover aligned windows at any offset
    val train = Seq(
      (1L, span + "abcdefgh" * 10),
      (2L, span + "zyxwvuts" * 10), // shares only the leading span with 1
      (3L, "short doc"),            // < window chars -> emits nothing
      (4L, (1 to 100).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.sharedWindowPairs(train, "doc_id", "text",
      window = 64, stride = 32)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length == 1)
    assert(pairs(0)._1 == 1L && pairs(0)._2 == 2L)
    // span of 200 identical chars at offset 0 -> aligned windows at 0,32,64,
    // 96,128 all inside the span, but "x"*64 windows are IDENTICAL strings,
    // deduped by the distinct -> exactly 1 shared window hash
    assert(pairs(0)._3 == 1L)
  }

  test("sharedWindowPairs stop-lists ubiquitous boilerplate windows") {
    // 30 docs all starting with the same 64-char boilerplate, pairwise
    // otherwise distinct: with maxPostings below 30 the boilerplate window
    // is dropped and no pairs remain; with a high cap, all pairs surface
    val boiler = "b" * 64
    val docs = (1L to 30L).map(i => (i, boiler + s" unique$i " * 10))
      .toDF("doc_id", "text")
    assert(Dedup.sharedWindowPairs(docs, "doc_id", "text",
      maxPostings = 10).count() == 0)
    assert(Dedup.sharedWindowPairs(docs, "doc_id", "text",
      maxPostings = 1000).count() == 30L * 29 / 2)
  }

  test("crossCorpusMaxRun reports the longest consecutive shared shingle run") {
    val bench = (1 to 20).map(i => s"b$i").mkString(" ")
    val train = Seq(
      // quotes bench tokens b1..b10 verbatim: 10 tokens -> 8 consecutive
      // 3-shingles -> max_run 8, span_tokens 10
      (1L, "intro words here " + (1 to 10).map(i => s"b$i").mkString(" ") +
        " trailing stuff"),
      // two SEPARATE quotes (b1..b5, b10..b14) split by unrelated tokens:
      // islands of 3 consecutive shingles each -> max_run 3, not 6
      (2L, (1 to 5).map(i => s"b$i").mkString(" ") + " gap1 gap2 gap3 " +
        (10 to 14).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 40).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val benchDf = Seq((100L, bench)).toDF("doc_id", "text")
    val out = Dedup.crossCorpusMaxRun(train, benchDf, "text", "doc_id",
        shingleK = 3, minRun = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out((1L, 100L)) == ((8L, 10L)))
    assert(out((2L, 100L)) == ((3L, 5L)))
    assert(!out.contains((3L, 100L)))
  }

  test("crossCorpusMaxRun stop-list splits runs but never invents them") {
    // every train doc shares the same 3-token boilerplate in the middle of
    // an otherwise-verbatim quote; with the boilerplate gram stop-listed the
    // run splits into two shorter islands
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val benchDf = Seq((100L, quote)).toDF("doc_id", "text")
    val full = Seq((1L, quote)).toDF("doc_id", "text")
    val okRun = Dedup.crossCorpusMaxRun(full, benchDf, "text", "doc_id",
      shingleK = 3, minRun = 2).collect()
    assert(okRun.length == 1 && okRun(0).getLong(2) == 10L) // 12 tokens -> 10 shingles
    // 50 extra train docs all containing the shingle "q5 q6 q7" push it over
    // maxPostings=40: doc 1's single run splits at the stop-listed grams
    val noisy = full.union(
      (2L to 51L).map(i => (i, s"pad${i}a pad${i}b q5 q6 q7 pad${i}c pad${i}d"))
        .toDF("doc_id", "text"))
    val capped = Dedup.crossCorpusMaxRun(noisy, benchDf, "text", "doc_id",
        shingleK = 3, minRun = 2, maxPostings = 40)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // grams q3q4q5..q7q8q9 (those containing q5 q6 q7? only "q5 q6 q7"
    // itself hits 51 docs) -> doc 1 keeps two islands around the dropped gram
    assert(capped(1L) < 10L && capped(1L) >= 2L)
  }

  test("sharedWindowPairs needs alignment: same span at misaligned offsets is missed") {
    val span = (1 to 30).map(i => s"unique$i").mkString(" ") // ~250 chars, no repeats
    val a = Seq((1L, span), (2L, "q " + span)).toDF("doc_id", "text") // offset 2
    assert(Dedup.sharedWindowPairs(a, "doc_id", "text").count() == 0)
    val b = Seq((1L, span), (2L, ("p" * 32) + span)).toDF("doc_id", "text") // offset 32
    assert(Dedup.sharedWindowPairs(b, "doc_id", "text").count() > 0)
  }
}
