package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).collect().head.get(0)

  test("tokenCount handles empty, blank and multi-space text") {
    assert(one("", TextAnalysis.tokenCount(col("text"))) == 0)
    assert(one("   ", TextAnalysis.tokenCount(col("text"))) == 0)
    assert(one("a  b   c", TextAnalysis.tokenCount(col("text"))) == 3)
  }

  test("subwordCount splits words, digits and punctuation") {
    // "ab, cd! 7x" -> ab , cd ! 7 x
    assert(one("ab, cd! 7x", TextAnalysis.subwordCount(col("text"))) == 6)
  }

  test("punct and stopword ratios") {
    assert(one("a.b,c", TextAnalysis.punctRatio(col("text"))) == 0.4)
    assert(one("the cat and the dog", TextAnalysis.stopwordRatio(col("text"))) == 0.6)
  }

  test("meanWordLen") {
    assert(one("ab cdef", TextAnalysis.meanWordLen(col("text"))) == 3.0)
  }

  test("qualityScore is bounded in [0,1]") {
    val scores = Seq("", "the a of to in is", "!!!???...", "x y z w")
      .toDF("text").select(TextAnalysis.qualityScore(col("text"))).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("langId picks marker-word argmax with fixed tie order, und fallback") {
    assert(one("the cat is on the mat", TextAnalysis.langId(col("text"))) == "en")
    assert(one("der hund ist das tier und", TextAnalysis.langId(col("text"))) == "de")
    assert(one("zzz qqq", TextAnalysis.langId(col("text"))) == "und")
    // 'la' appears in both fr and es marker lists -> fr wins (fixed order)
    assert(one("la la la", TextAnalysis.langId(col("text"))) == "fr")
  }

  test("fingerprint equals the rolling-hash recurrence") {
    val expected = "abc".foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    assert(one("abc", TextAnalysis.fingerprint(col("text"))) == expected)
  }

  test("tfIdfTopTerms: rare terms outrank common ones, topN bounds, no Window") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common common durian")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, "text", "doc_id", topN = 2)
    val byDoc = out.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3)).map(r => (r.getString(1), r.getDouble(2)))).toMap
    // doc 1: apple (tf=2, df=1 -> idf ln(2)+1) far above the ubiquitous "common"
    assert(byDoc(1L).head._1 == "apple")
    // doc 3: common's tf=2 at idf=ln(4/4)+1=1 -> 2.0 edges durian's 1*ln(2)+1
    assert(byDoc(3L).map(_._1).toSeq == Seq("common", "durian"))
    assert(byDoc.values.forall(_.length <= 2))
    assert(byDoc(3L).head._2 == 2.0)
    // hand-check doc3/durian: tf=1, idf = ln(4/2)+1
    val expected = BigDecimal(math.log(2.0) + 1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byDoc(3L)(1)._2 == expected)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_topk_agg"), p)
  }

  test("bm25TopDocs scores Okapi BM25 and ranks score-desc, id-asc") {
    import spark.implicits._
    val docs = Seq((1L, "spark spark fast"), (2L, "spark slow"),
      (3L, "other words here")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopDocs(docs, "doc_id", "text",
        queryTerms = Seq("spark"), k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // independent reimplementation: N=3, df=2, avgdl=8/3
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val idf = math.log(1.0 + (3.0 - 2 + 0.5) / (2 + 0.5))
    def s(tf: Double, dl: Double) =
      r4(idf * tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (8.0 / 3))))
    assert(out.toSeq == Seq((1L, s(2, 3), 1L), (2L, s(1, 2), 2L)))
    // d3 never matches the query -> absent, not zero-scored
    assert(!out.exists(_._1 == 3L))
  }

  test("repetitionMetrics flags repeated words/trigrams and handles short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam ham eggs"), // 80% one word
      (2L, (1 to 40).map(i => s"w$i").mkString(" ")),           // all distinct
      (3L, "go go go go go go " * 4),                           // repeated trigram
      (4L, "two words")                                         // no trigrams
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(m(1L)._1 == 10L && m(1L)._2 == 0.8 && m(1L)._4)       // top_word_frac
    assert(m(2L)._2 < 0.1 && m(2L)._3 == 0.0 && !m(2L)._4)       // clean doc
    assert(m(3L)._3 == 1.0 && m(3L)._4)                          // every trigram dup'd
    assert(m(4L)._1 == 2L && m(4L)._3 == 0.0)                    // short doc: no trigrams
  }

  test("normalizeText: NFC-composes, strips controls, collapses whitespace, keeps NBSP") {
    val rows = Seq(
      (1L, "Cafe\u0301"),            // decomposed -> composed
      (2L, "a\u0000b\tc"),            // NUL and tab -> single spaces
      (3L, "  x   y\n\nz  "),         // collapse + trim
      (4L, "nb\u00a0sp"),             // NBSP is content, not whitespace
      (5L, "already clean")
    ).toDF("id", "t")
    val out = rows.select($"id", TextAnalysis.normalizeText(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "Caf\u00e9")
    assert(out(2L) == "a b c")
    assert(out(3L) == "x y z")
    assert(out(4L) == "nb\u00a0sp")
    assert(out(5L) == "already clean")
    // normalization makes the decomposed/composed forms exact-dedup equal
    val pair = Seq((1L, "Cafe\u0301 x"), (2L, "Caf\u00e9 x")).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.normalizeText(col("text")).as("text"))
    assert(Dedup.exact(pair, "text", "doc_id")
      .filter(col("dup_count") > 1).count() == 1)
  }

  test("qualityLogit: sigmoid of the rounded features, keep = logit sign") {
    val rows = Seq(
      // 4 tokens, 1 stopword ("the"), no punct, mwl (3+3+5+3)/4 = 3.5
      (1L, "the cat likes fsh"),
      // punctuation soup: heavy negative weight drives keep = false
      (2L, "!!! ??? ,,, ;;;"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityLogit(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    // doc 1: logit = -1 + .04*2 + .25*3 - 0 + .35*.5 = 0.005 -> keep
    assert(out(1L)._2)
    assert(math.abs(out(1L)._1 - 1.0 / (1.0 + math.exp(-0.005))) < 5e-5)
    assert(!out(2L)._2)
    // empty doc: all features 0 -> logit = bias = -1 -> sigmoid 0.2689
    assert(out(3L) == ((0.2689, false)))
  }

  test("fertilityReport computes subwords-per-word and chars/bytes-per-subword") {
    val docs = Seq(
      // "ab cd" -> 2 words, 2 subwords, 5 chars; "x9 y"  -> 2 words, 3 subwords
      (1L, "ab cd", "s1"), (2L, "x9 y", "s1"),
      // punctuation splits into its own subword: "hi, there" -> 2 words, 3 subwords
      (3L, "hi, there", "s2")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.fertilityReport(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("s1") == ((2L, 4L, 5L, 1.25))) // subwords 2 + 3, words 2 + 2
    assert(out("s2") == ((1L, 2L, 3L, 1.5)))
  }

  test("redact replaces every match; redactReport shows the cardinality collapse") {
    import spark.implicits._
    val rows = Seq(
      ("a", "user 123456 and 987654 done"),   // two ids, both replaced
      ("a", "user 555555 and 444444 done"),   // distinct text, same template
      ("a", "no identifiers at all"),
      ("b", "id 12345 too short")             // 5 digits: below {6,}
    ).toDF("grp", "t")
    val red = rows.select(
      TextAnalysis.redact(col("t"), "[0-9]{6,}", "[ID]").as("r"))
      .collect().map(_.getString(0))
    assert(red(0) == "user [ID] and [ID] done")
    assert(red(3) == "id 12345 too short")
    val rep = TextAnalysis.redactReport(rows, "grp", "t", "[0-9]{6,}")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // group a: 3 rows, 4 matches, 3 distinct before, 2 after (the two id
    // rows collapse onto one template; the no-id row stays itself)
    assert(rep("a") == ((3L, 4L, 3L, 2L)))
    assert(rep("b") == ((1L, 0L, 1L, 1L)))
  }

  test("readabilityReport: hand-counted totals; punctuation-free text floors at one sentence") {
    import spark.implicits._
    // doc 1: "the cat sat. it ran!" -> 5 words, 2 sentences,
    //   syllables (vowel groups): the(1) cat(1) sat(1) it(1) ran(1) = 5
    // doc 2: "beautiful onomatopoeia" -> 2 words, 1 sentence (floored),
    //   vowel groups: beautiful eau,i,u = 3; onomatopoeia o,o,a,o,oeia = 5
    val df = Seq(("s1", "the cat sat. it ran!"),
      ("s1", "beautiful onomatopoeia")).toDF("src", "text")
    val r = TextAnalysis.readabilityReport(df, "src", "text").collect().head
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == math.rint(1e4 * 7.0 / 3.0) / 1e4) // 7 w / 3 s
    assert(r.getDouble(3) == math.rint(1e4 * 13.0 / 7.0) / 1e4) // 13 sy / 7 w
    // simple prose scores easier (higher ease, lower grade) than jargon
    val simple = Seq(("a", "the cat sat on the mat. it was fun.")).toDF("src", "text")
    val dense = Seq(("a", "organizational interoperability necessitates comprehensive standardization methodologies")).toDF("src", "text")
    val es = TextAnalysis.readabilityReport(simple, "src", "text").collect().head
    val ed = TextAnalysis.readabilityReport(dense, "src", "text").collect().head
    assert(es.getDouble(4) > ed.getDouble(4), "simple prose reads easier")
    assert(es.getDouble(5) < ed.getDouble(5), "jargon grades higher")
  }

  test("langConfusion: diagonal share is per-class recall, leaks localized") {
    import spark.implicits._
    val docs = Seq(
      ("en", "the cat and the dog"),          // correctly en
      ("en", "der die und das ist hier"),     // mislabeled corpus row -> de
      ("de", "der hund ist gut")).toDF("lang", "text")
    val out = TextAnalysis.langConfusion(docs, "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("en", "en")) == ((1L, 0.5)), "en recall is the diagonal share")
    assert(out(("en", "de")) == ((1L, 0.5)), "the leak cell names the confuser")
    assert(out(("de", "de")) == ((1L, 1.0)))
    assert(out.size == 3)
  }

  test("charStats: codepoint entropy closed form, non-ascii share exact") {
    import spark.implicits._
    val docs = Seq(("a", "aab"), ("b", "é")).toDF("src", "text")
    val out = TextAnalysis.charStats(docs, "src", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // H(aab) = log2(3) - (2*log2(2) + 1*log2(1))/3
    val h = math.log(3.0) / math.log(2.0) - 2.0 / 3.0
    assert(out("a") == ((3L, 2L, math.rint(h * 1e4) / 1e4, 0.0)))
    assert(out("b") == ((1L, 1L, 0.0, 1.0)),
      "single non-ascii char: zero entropy, full non-ascii share")
  }

  test("winnowingReport: duplicate docs share fingerprints, short docs emit none") {
    import spark.implicits._
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, "s1", long),                       // identical pair -> shared
      (2L, "s1", long),
      (3L, "s2", "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen"),   // unique -> not shared
      (4L, "s3", "tiny doc here")             // 1 shingle < w -> 0 selected
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.winnowingReport(docs, "doc_id", "source", "text",
        k = 3, w = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]), r.getLong(5)))).toMap
    val s1 = out("s1")
    assert(s1._1 == 2L && s1._2 == 20L, "12 words -> 10 3-shingles per doc")
    assert(s1._3 > 0 && s1._3 % 2 == 0,
      "identical docs select identical fingerprint sets")
    assert(s1._5 == 2L, "both copies share every fingerprint")
    assert(out("s2")._5 == 0L, "unique content shares nothing")
    assert(out("s3")._3 == 0L && out("s3")._4.contains(0.0),
      "fewer than w shingles: no window, no fingerprints, zero density")
    // density ~= 2/(w+1); with w=4 leftmost-min dedup it stays well under 1
    assert(s1._4.exists(d => d > 0.0 && d <= 1.0))
  }
}
