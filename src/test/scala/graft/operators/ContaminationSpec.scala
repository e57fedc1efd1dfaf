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

  test("sharedWindowPairs needs alignment: same span at misaligned offsets is missed") {
    val span = (1 to 30).map(i => s"unique$i").mkString(" ") // ~250 chars, no repeats
    val a = Seq((1L, span), (2L, "q " + span)).toDF("doc_id", "text") // offset 2
    assert(Dedup.sharedWindowPairs(a, "doc_id", "text").count() == 0)
    val b = Seq((1L, span), (2L, ("p" * 32) + span)).toDF("doc_id", "text") // offset 32
    assert(Dedup.sharedWindowPairs(b, "doc_id", "text").count() > 0)
  }
}
