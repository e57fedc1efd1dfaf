package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("chunkByTokens: overlapping windows, short docs get one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens, chunk=4, ov=1
      (2L, "a b")                                     // shorter than one chunk
    ).toDF("doc_id", "text")
    val out = Corpus.chunkByTokens(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: starts 0,3,6 -> token counts 4,4,4 covering tokens 1-10 with
    // no tail chunk contained in its predecessor (start 9 would re-emit
    // only token 10, already covered by the start-6 chunk)
    assert(out == Set((1L, 0L, 4L), (1L, 1L, 4L), (1L, 2L, 4L), (2L, 0L, 2L)))
    val chunks = Corpus.chunkByTokens(docs, "doc_id", "text", 4, 1)
    assert(chunks.select("chunk_md5").distinct().count() == 4) // all distinct here
  }

  test("chunkByTokens never emits a chunk contained in its predecessor") {
    // 73 tokens, size 32, overlap 8 (q77's settings): starts 0,24,48 — the
    // old start-72 single-token chunk was inside the start-48 window
    val docs = Seq((1L, (1 to 73).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = Corpus.chunkByTokens(docs, "doc_id", "text", 32, 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 32L), (1L, 32L), (2L, 25L)))
  }

  test("buildVocab ranks by count then token; oovRate counts misses") {
    val docs = Seq(
      ("s1", "x x x y y z"),
      ("s2", "x q q q")
    ).toDF("source", "text")
    val vocab = Corpus.buildVocab(docs, "text", vocabSize = 2)
    val v = vocab.orderBy("rank").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(v.toSeq == Seq(("x", 4L), ("q", 3L))) // counts 4,3 beat y=2,z=1
    val oov = Corpus.oovRate(docs, "source", "text", vocab).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(oov("s1") == ((6L, 0.5)))  // y y z OOV of 6
    assert(oov("s2") == ((4L, 0.0)))  // x q q q all in vocab
  }

  test("bpePairCounts counts in-word adjacent char pairs, ranked") {
    val docs = Seq((1L, "aba ab"), (2L, "x aba")).toDF("doc_id", "text")
    // words: aba, ab, aba ('x' too short). pairs: ab,ba | ab | ab,ba
    // -> ab: 3, ba: 2
    val out = Corpus.bpePairCounts(docs, "text", topK = 5)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("ab", 3L, 1L), ("ba", 2L, 2L)))
  }

  test("bpeLearn learns the classic low/lower/lowest merge table in order") {
    // words: low x2, lower x1, lowest x1 (split across two docs to prove
    // the vocab aggregation is corpus-wide, not per-doc)
    val docs = Seq((1L, "low lower"), (2L, "low lowest")).toDF("doc_id", "text")
    val out = Corpus.bpeLearn(docs, "text", nMerges = 10)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    // round 1: (l,o)=4 ties (o,w)=4, lexicographically smallest wins;
    // rounds proceed lo->low->lowe->lower->lowes->lowest then go dry
    // before exhausting nMerges=10
    assert(out.toSeq == Seq(
      (1L, "l", "o", "lo", 4L),
      (2L, "lo", "w", "low", 4L),
      (3L, "low", "e", "lowe", 2L),
      (4L, "lowe", "r", "lower", 1L),
      (5L, "lowe", "s", "lowes", 1L),
      (6L, "lowes", "t", "lowest", 1L)))
  }

  test("bpeLearn counts overlapping pairs but applies merges greedily") {
    // "aaa": pair (a,a) occurs at 2 positions (overlap counted), but the
    // merge rewrites greedily left-to-right -> [aa, a], the reference
    // BPE application rule
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val out = Corpus.bpeLearn(docs, "text", nMerges = 5)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(out.toSeq == Seq(("a", "a", 4L), ("aa", "a", 2L)))
  }

  test("bpeLearn batched (fast-BPE) equals sequential at fewer rounds") {
    // tie- and run-heavy by construction: (c,d) and (l,l) tie at 8 (both
    // batchable — symbol-disjoint), (x,y)/(y,z) tie at 5 INSIDE one word
    // (xyz), so the batch must drop (x,y) at the sharing cutoff and
    // replay it sequentially; lll exercises greedy run application
    val docs = Seq(
      (1L, (Seq.fill(9)("ab") ++ Seq.fill(8)("cd")).mkString(" ")),
      (2L, (Seq.fill(4)("lll") ++ Seq.fill(5)("xyz")).mkString(" "))
    ).toDF("doc_id", "text")
    val (m1, _, r1) = Corpus.bpeTrain(docs, "text", nMerges = 6, batch = 1)
    val (m8, _, r8) = Corpus.bpeTrain(docs, "text", nMerges = 6, batch = 8)
    assert(m1 == Seq(("a", "b", 9L), ("c", "d", 8L), ("l", "l", 8L),
      ("x", "y", 5L), ("xy", "z", 5L), ("ll", "l", 4L)))
    assert(m8 == m1, "batched merge table must equal the sequential one")
    assert(r1 == 6 && r8 == 3,
      s"batching must cut rounds: sequential $r1, batched $r8")
    // and the full learn/encode surfaces agree end to end
    val lSeq = Corpus.bpeLearn(docs, "text", 6, batch = 1)
      .orderBy("merge_rank").collect().toSeq
    val lBat = Corpus.bpeLearn(docs, "text", 6, batch = 8)
      .orderBy("merge_rank").collect().toSeq
    assert(lSeq == lBat)
  }

  test("bpeTrain batched equals sequential on random 2-letter corpora (fuzz)") {
    // a 2-letter alphabet maximizes concatenation collisions: merged
    // outputs ("ab", "ba", "aab"...) keep re-entering the pair stream as
    // components, which is exactly the creator-before-consumer seam the
    // output-tracking disjointness check guards (a batch accepting
    // ("a","ba") must refuse a later ("aba","b") in the same batch even
    // though the component STRINGS are disjoint). Deterministic seed.
    val rnd = new scala.util.Random(20260815L)
    (1 to 4).foreach { trial =>
      val docs = (1L to 6L).map { id =>
        val words = (1 to 8).map { _ =>
          (1 to (2 + rnd.nextInt(5)))
            .map(_ => if (rnd.nextBoolean()) "a" else "b").mkString
        }
        (id, words.mkString(" "))
      }.toDF("doc_id", "text")
      val (m1, _, _) = Corpus.bpeTrain(docs, "text", nMerges = 6, batch = 1)
      val (m4, _, r4) = Corpus.bpeTrain(docs, "text", nMerges = 6, batch = 4)
      assert(m4 == m1,
        s"trial $trial: batched table $m4 diverged from sequential $m1")
      assert(r4 <= 6, s"trial $trial: batching must never add rounds")
    }
  }

  test("bpeEncode reports fertility under the learned merge table") {
    // 3 merges on the low/lower/lowest corpus: lo, low, lowe — so
    // low->[low](1 tok), lower->[lowe,r](2), lowest->[lowe,s,t](3)
    val docs = Seq(("s1", "low lower"), ("s2", "low lowest"))
      .toDF("source", "text")
    val out = Corpus.bpeEncode(docs, "text", "source", nMerges = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("s1") == ((2L, 3L, 1.5, 2.6667))) // 8 chars / 3 bpe tokens
    assert(out("s2") == ((2L, 4L, 2.0, 2.25)))   // 9 chars / 4 bpe tokens
  }

  test("domainCapReport caps per host deterministically") {
    val docs = (1L to 5L).map(i => (i, "https://big.example.com/p/" + i)) ++
      Seq((6L, "https://mid.example.com/p/6"), (7L, "https://mid.example.com/p/7"),
        (8L, "https://one.example.com/p/8"))
    val out = Corpus.domainCapReport(docs.toDF("doc_id", "url"), "url", "doc_id",
        cap = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("big.example.com") == ((5L, 3L, 2L))) // capped
    assert(out("mid.example.com") == ((2L, 2L, 0L))) // under cap
    assert(out("one.example.com") == ((1L, 1L, 0L)))
    // partition-layout invariant (hash order, not first-seen order)
    val again = Corpus.domainCapReport(docs.toDF("doc_id", "url").repartition(7),
        "url", "doc_id", cap = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == out)
  }

  test("domainCapReport labels malformed URLs instead of a silent null group") {
    val docs = Seq((1L, "https://ok.example.com/x"), (2L, "not a url"),
      (3L, "also-garbage")).toDF("doc_id", "url")
    val out = Corpus.domainCapReport(docs, "url", "doc_id", cap = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("ok.example.com") == 1L)
    assert(out("(invalid)") == 2L) // visible, countable, still capped
  }

  test("domainCapReport is a pure aggregation — no rank window for a mega-host to single-partition") {
    val docs = (1L to 10L).map(i => (i, s"https://h$i.example.com/x")).toDF("doc_id", "url")
    val p = Corpus.domainCapReport(docs, "url", "doc_id", cap = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"domain-cap counts went through a window:\n$p")
  }

  test("domainCapDocs: a host holding half the corpus rides the bounded top-k path") {
    // mega.example.com holds ~half the rows — the shape that would
    // single-partition a rank window; the TopKAgg path shuffles <= cap
    // candidates per input partition per host instead
    val docs = ((1L to 500L).map(i => (i, "https://mega.example.com/p/" + i)) ++
      (501L to 1000L).map(i => (i, s"https://h${i % 50}.example.com/p/" + i)))
      .toDF("doc_id", "url").repartition(8)
    val capped = Corpus.domainCapDocs(docs, "url", "doc_id", cap = 4)
    val p = capped.queryExecution.executedPlan.toString
    assert(p.contains("partial_topk_agg"), s"no map-side partial top-k:\n$p")
    assert(!p.contains("Window"), s"mega-host rank became a window sort:\n$p")
    // survivor SET matches the rank-window formulation exactly (same
    // (hash, id) order, same cap) — including for the mega-host
    val byWindow = Sampling.stratifiedSample(
        docs.select(col("doc_id").as("id"),
          expr("try_parse_url(url, 'HOST')").as("host")), "host", "id", 4)
      .select("host", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = capped.select("host", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == byWindow)
    assert(got.count(_._1 == "mega.example.com") == 4)
  }

  test("unigramLogProb: uniform docs score ln(freq/N) exactly") {
    val docs = Seq((1L, "a a"), (2L, "b")).toDF("doc_id", "text")
    // N=3; a:2, b:1
    val m = Corpus.unigramLogProb(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(1L) == r4(math.log(2.0 / 3.0)))
    assert(m(2L) == r4(math.log(1.0 / 3.0)))
  }

  test("bigramLogProb: MLE conditionals c(w1 w2)/c_prefix(w1); short docs drop out") {
    // corpus bigrams: doc1 "a b" x1, "b a" x1, "a b" (doc2) x1 -> c(a b)=2,
    // c(b a)=1; prefix counts: a as prefix 2x, b as prefix 1x
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val m = Corpus.bigramLogProb(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc1: ln P(b|a) + ln P(a|b) over 2 positions = ln(2/2) + ln(1/1) = 0
    assert(m(1L) == ((2L, 0.0)))
    // doc2: single position ln P(b|a) = ln(2/2) = 0
    assert(m(2L) == ((1L, 0.0)))
    // doc3 has no bigram
    assert(!m.contains(3L))

    // a corpus where conditionals differ from joint frequencies: "c d" and
    // "c e" split prefix c -> P(d|c) = 1/2 even though c(c d)=1
    val docs2 = Seq((1L, "c d"), (2L, "c e")).toDF("doc_id", "text")
    val m2 = Corpus.bigramLogProb(docs2, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m2(1L) == r4(math.log(0.5)) && m2(2L) == r4(math.log(0.5)))
  }

  test("lexicalDiversity: entropy/TTR/hapax on hand-computable docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),      // one type: entropy 0, ttr .25, hapax 0
      (2L, "a b c d"),      // uniform: entropy ln 4, ttr 1, hapax 1
      (3L, "a a b")         // p = (2/3, 1/3)
    ).toDF("doc_id", "text")
    val out = Corpus.lexicalDiversity(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((4L, 1L, 0.25, 0.0, 0.0)))
    assert(out(2L) == ((4L, 4L, 1.0, r4(math.log(4.0)), 1.0)))
    val h3 = -(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3)
    assert(out(3L)._1 == 3L && out(3L)._2 == 2L)
    assert(math.abs(out(3L)._4 - h3) < 1e-3)
    assert(out(3L)._5 == 0.5) // "b" is the hapax among 2 types
  }

  test("sourceSimilarityMatrix: identical sources cos 1, disjoint cos absent/0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "a b"), (2L, "s2", "a b"),   // identical count vectors
      (3L, "s3", "z z")                        // disjoint vocabulary
    ).toDF("doc_id", "source", "text")
    val out = Corpus.sourceSimilarityMatrix(docs, "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("s1", "s2")) == 1.0)
    // disjoint pairs share no word key -> no row (the sparse-join contract)
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s3")))
  }

  test("sourceKlReport: corpus-distributed source scores 0, divergent scores >0") {
    import spark.implicits._
    // sources s1/s2 have IDENTICAL word distributions (each is half the
    // corpus) -> P_source == P_corpus -> KL = 0 for both. s3 is disjoint.
    val docs = Seq(
      (1L, "s1", "a a b"), (2L, "s2", "a a b"),
      (3L, "s3", "z z z")
    ).toDF("doc_id", "source", "text")
    val out = Corpus.sourceKlReport(docs, "source", "text").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // s1: 3 tokens, vocab {a, b}; P_s(a)=2/3 vs P_c(a)=4/9 etc -> KL > 0
    assert(out("s1")._1 == 3L && out("s1")._2 == 2L)
    assert(out("s1")._3 == out("s2")._3) // symmetric halves score equally
    // s3 is fully disjoint: KL = ln(9/3) = ln 3 (its words are 3/9 of corpus)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("s3")._3 == r4(math.log(3.0)))
    assert(out("s1")._3 > 0.0)
  }

  test("logOddsTerms surfaces a source's exclusive term with positive z") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "alpha beta gamma quantum", "s1"),
      (3L, "alpha beta gamma delta", "s2"),
      (4L, "alpha beta gamma epsilon", "s2")
    ).toDF("doc_id", "text", "source")
    val out = Corpus.logOddsTerms(docs, "source", "text", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    // "quantum" is exclusive to s1, "epsilon" to s2: each tops its source
    val (t1, c1, z1) = out(("s1", 1L))
    val (t2, _, z2) = out(("s2", 1L))
    assert(t1 == "quantum" && c1 == 1L && z1 > 0.0)
    assert(t2 == "epsilon" && z2 > 0.0)
    // shared terms score |z| near 0 relative to the exclusives
    assert(out(("s1", 2L))._3 < z1)
  }

  test("pmiPairs: co-traveling terms score high, independent terms near zero") {
    // "rocket" and "launch" always co-occur (4 docs of 8); "the" appears
    // everywhere (independent of both)
    val docs = (1L to 4L).map(i => (i, s"the rocket launch pad$i")) ++
      (5L to 8L).map(i => (i, s"the quiet garden bench$i"))
    val out = Corpus.pmiPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        vocabTopK = 10, minPairDocs = 2, topK = 10)
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getDouble(4))
      .toMap
    // PMI(launch, rocket) = ln(4*8/(4*4)) = ln 2
    assert(math.abs(out(("launch", "rocket")) - math.log(2.0)) < 1e-6)
    // PMI(the, rocket) = ln(4*8/(8*4)) = 0 — independence
    assert(out(("rocket", "the")) == 0.0)
  }

  test("ngramNovelty: repetition lowers novelty, shared text lowers exclusivity") {
    val docs = Seq(
      // s1: "a b c" twice -> 4 trigram instances ("a b c", "b c a", "c a b",
      // "a b c"), 3 distinct; "a b c" also appears in s2 -> 2 exclusive
      (1L, "a b c a b c", "s1"),
      // s2: 1 instance, 1 distinct, shared with s1 -> 0 exclusive
      (2L, "a b c", "s2"),
      // s3: fully unique text -> novelty 1, exclusivity 1
      (3L, "x y z w", "s3")
    ).toDF("doc_id", "text", "source")
    val out = Corpus.ngramNovelty(docs, "source", "text", k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out("s1") == ((4L, 3L, 2L, 0.75, 0.6667)))
    assert(out("s2") == ((1L, 1L, 0L, 1.0, 0.0)))
    assert(out("s3") == ((2L, 2L, 2L, 1.0, 1.0)))
  }

  test("dsirWeights: target==source scores exactly 0; target-like docs rank higher") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "the quick brown dog runs far"),
      (3L, "completely unrelated legal boilerplate text here"),
      (4L, "the quick brown fox jumps high")  // twin of 1
    ).toDF("doc_id", "text")
    // identity: when the target IS the source, every per-gram ratio is 1
    // (ct=cs, totT=totS) and every log weight is exactly 0.0
    val self = Corpus.dsirWeights(docs, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(self.size == 4 && self.values.forall(_ == 0.0))
    // n_feats = unigrams + bigrams = 6 + 5
    val nf = Corpus.dsirWeights(docs, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nf.values.forall(_ == 11L)) // every doc: 6 tokens -> 6 + 5 feats
    // directional: target = the fox docs -> fox docs outrank the boilerplate
    val target = docs.filter($"doc_id" === 1L || $"doc_id" === 4L)
    val w = Corpus.dsirWeights(docs, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) == w(4L))          // identical docs, identical weight
    assert(w(1L) > w(2L))           // partial overlap scores between
    assert(w(2L) > w(3L))           // no overlap scores lowest
  }

  test("zipfFit: exact power law fits slope -1 with r2 = 1; flat source degenerates") {
    import spark.implicits._
    // source zipf: freq halves when rank doubles -> ln f = ln 6 - 1 * ln r
    val zipf = ("a " * 6 + "b " * 3).trim
    // source flat: two tokens at identical frequency -> syy = 0 -> r2 null
    val flat = ("x " * 4 + "y " * 4).trim
    val docs = Seq((1L, zipf, "zipf"), (2L, flat, "flat"))
      .toDF("doc_id", "text", "source")
    val out = Corpus.zipfFit(docs, "source", "text", topN = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val z = out("zipf")
    assert(z.getLong(1) == 2L && z.getDouble(2) == -1.0 && z.getDouble(4) == 1.0)
    val f = out("flat")
    assert(f.getLong(1) == 2L && f.getDouble(2) == 0.0 && f.isNullAt(4))
  }

  test("zipfFit rank ties break by token and topN caps the fit window") {
    import spark.implicits._
    // c and d tie at freq 2: rank(c)=2, rank(d)=3 by token asc; topN=2
    // keeps only ranks 1-2, so d never enters the regression
    val docs = Seq((1L, "a a a a c c d d", "s")).toDF("doc_id", "text", "source")
    val r = Corpus.zipfFit(docs, "source", "text", topN = 2).collect()(0)
    assert(r.getLong(1) == 2L)
    // points: (ln1, ln4), (ln2, ln2) -> slope = (ln2-ln4)/(ln2-ln1) = -1
    assert(r.getDouble(2) == -1.0)
  }

  test("vocabCoverage: rank ties break by token, curve saturates past the vocab") {
    import spark.implicits._
    // counts: a=4, b=2, c=2, d=1 (9 tokens, vocab 4); b/c tie -> b rank 2
    val docs = Seq((1L, "a a b c"), (2L, "a a b c d")).toDF("doc_id", "text")
    val out = Corpus.vocabCoverage(docs, "text", ks = Seq(1, 2, 3, 10))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((4L, 0.444444, 4L, 9L)))
    assert(out(2L) == ((6L, 0.666667, 4L, 9L))) // top-2 = a + b (tie-break)
    assert(out(3L) == ((8L, 0.888889, 4L, 9L)))
    assert(out(10L) == ((9L, 1.0, 4L, 9L))) // k > vocab saturates
  }

  test("heapsFit: exact-power-law points recover beta and K; r2 = 1") {
    import spark.implicits._
    // build groups whose (N, V) sit EXACTLY on V = N^0.5: group g_m has
    // m^2 tokens with m distinct words (word j repeated m times)
    val rows = (2 to 6).map { m =>
      val text = (0 until m).flatMap(j => Seq.fill(m)(s"w${m}_$j")).mkString(" ")
      (s"g$m", text)
    }
    val out = Corpus.heapsFit(rows.toDF("src", "text"), "src", "text")
      .collect().head
    assert(out.getLong(0) == 5L)
    assert(out.getDouble(1) == 0.5, s"beta ${out.getDouble(1)}")
    assert(out.getDouble(2) == 1.0, s"K ${out.getDouble(2)}")
    assert(out.getDouble(3) == 1.0, s"r2 ${out.getDouble(3)}")
  }
}
