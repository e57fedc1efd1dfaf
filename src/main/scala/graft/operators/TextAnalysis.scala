package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting. All are
  * codegen'd builtin-function pipelines over the text column — no UDFs — so
  * they run inside the parquet scan's whole-stage-codegen loop and cost one
  * pass over the corpus.
  */
object TextAnalysis {

  /** Smoothed TF-IDF top terms per document: for every (doc, term),
    * `tf * (ln((N+1)/(df+1)) + 1)` rounded to 4dp, keeping the `topN`
    * highest-scoring terms (score DESC, term ASC — rounding first makes the
    * cut deterministic across engines). Term/document frequencies are two
    * shuffled aggregations over the exploded token table; the per-doc top-N
    * rides the bounded [[graft.functions.TopKAgg]] with map-side partial
    * aggregation, so no window ever sorts the full (doc, term) set. */
  def tfIdfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    topN: Int = 5): DataFrame = {
    graft.functions.TopKAgg.register(df.sparkSession)
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy("term").agg(countDistinct(col("doc_id")).as("dfc"))
    val n = df.agg(count(lit(1)).cast("double").as("n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * (log((col("n") + 1) / (col("dfc") + 1)) + 1), 4))
    scored.groupBy("doc_id")
      .agg(graft.functions.TopKAgg.topK(
        struct(negate(col("score")).as("ns"), col("term").as("term")), topN).as("arr"))
      .select(col("doc_id"), posexplode(col("arr")))
      .select(col("doc_id"), col("col.term").as("term"),
        negate(col("col.ns")).as("score"), (col("pos") + 1).as("rank"))
  }

  /** BM25 retrieval scoring: rank the corpus against a bag-of-words query
    * (Robertson/Sparck-Jones Okapi BM25, the lexical-retrieval baseline a
    * curation pipeline uses for targeted corpus search and contamination
    * triage). Per (doc, term): tf from one exploded aggregation; df and
    * avgdl from two corpus-level aggregates (both dimension-sized →
    * broadcast); score(D,Q) = sum over query terms of
    * `idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*len/avgdl))` with the
    * standard smoothed `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`.
    *
    * The query-term list is a literal filter pushed into the exploded token
    * stream, so only matching (doc, term) rows ever aggregate — the corpus
    * is scanned once and the scored set is bounded by |matching docs|, and
    * the final top-`k` rides the bounded [[graft.functions.TopKAgg]] (no
    * global sort; map-side partial keeps k rows per partition). Returns
    * (doc_id, score, rank) for the top-k, ties broken on doc_id. */
  def bm25TopDocs(df: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String], k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "need query terms and k > 0")
    graft.functions.TopKAgg.register(df.sparkSession)
    // doc length is a projection (size of the token array), NOT an exploded
    // count — the only rows that ever reach a shuffle are the query-term
    // matches; the corpus-wide (doc, term) explosion stays inside one
    // codegen stage and dies at the isin filter
    val docs = df.select(col(idCol).as("doc_id"),
      split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = docs.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val qtoks = docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = qtoks.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .localCheckpoint() // tf feeds both the df-counts and the scoring: one corpus pass
    // tf is one row per (doc, term), so df(t) is a plain count over tf
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfc"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("n") - col("dfc") + 0.5) / (col("dfc") + 0.5)))
      .withColumn("tscore",
        col("idf") * col("tf") * (lit(k1) + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(col("tscore")), 4).as("score"))
    scored
      .agg(graft.functions.TopKAgg.topK(
        struct(negate(col("score")).as("ns"), col("doc_id").as("doc_id")), k).as("arr"))
      .select(posexplode(col("arr")))
      .select(col("col.doc_id").as("doc_id"), negate(col("col.ns")).as("score"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Canonical text normalization (NFC + control-strip + whitespace
    * collapse) — run BEFORE any hashing/dedup so byte-level noise doesn't
    * defeat fingerprints ([[graft.functions.NormalizeText]]). */
  def normalizeText(text: Column): Column =
    graft.functions.TextHashFunctions.normalizeText(text)

  /** Whitespace token count (0 for empty/blank docs). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word chunks, digit runs and single punctuation
    * each count as one token (a cheap deterministic proxy for a real BPE
    * vocabulary — the regex families mirror common pretokenizers). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of punctuation chars to total chars, 4dp. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      round(size(regexp_extract_all(text, lit("[\\.,;:!\\?'\"\\(\\)]"), lit(0)))
        .cast("double") / length(text), 4))

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as")

  /** Fraction of tokens that are (English) stopwords, 4dp. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val stops = filter(toks, t => t.isin(stopwords: _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(round(size(stops).cast("double") / size(toks), 4))
  }

  /** Mean word length, 4dp (0 for empty docs). */
  def meanWordLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) === 0, lit(0.0)).otherwise(
      round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks), 4))
  }

  /** Composite quality score in [0,1], 4dp: rewards stopword presence and
    * moderate length; penalizes punctuation soup. Deterministic arithmetic so
    * the oracle can recompute it. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    round((lenScore * 0.4 + stopScore * 0.4 + punctPenalty * 0.2), 4)
  }

  /** Model-based quality filtering (the fastText-classifier stage of a
    * CCNet/RefinedWeb pipeline, with the learned weights supplied as plain
    * doubles): score = σ(bias + w·x) over the deterministic text features
    * above, keep = logit >= 0. The features are the ROUNDED 4dp values the
    * other gates expose, so any engine reproduces the logit exactly; the
    * keep decision uses the logit sign (not the sigmoid) and is therefore
    * exp-parity-free. One codegen'd projection, zero shuffles — swap the
    * weight constants for real trained weights without touching the plan. */
  def qualityLogit(df: DataFrame, idCol: String, textCol: String,
                   bias: Double = -1.0, wLen: Double = 2.0, wStop: Double = 3.0,
                   wPunct: Double = -4.0, wMwl: Double = 0.5): DataFrame = {
    val t = col(textCol)
    val x1 = least(tokenCount(t).cast("double") / 100.0, lit(1.0))
    val x4 = least(meanWordLen(t) / 10.0, lit(1.0))
    val logit = lit(bias) + x1 * wLen + stopwordRatio(t) * wStop +
      punctRatio(t) * wPunct + x4 * wMwl
    df.select(col(idCol),
      round(lit(1.0) / (lit(1.0) + exp(negate(logit))), 4).as("quality_prob"),
      (logit >= 0.0).as("keep"))
  }

  /** Language-ID heuristic: score each language by counts of its marker words
    * (classic stopword-profile n-gram heuristic collapsed to word unigrams),
    * pick the argmax, fall back to "und" when nothing matches. Marker lists
    * are deliberately tiny — the operator's value is the scalable shape
    * (per-doc scoring in one codegen pass), not the lexicon. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "that"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "la", "que", "es", "los"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = split(trim(lower(text)), "\\s+")
    langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }
  }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in fixed order) achieving the max score wins
    scores.reverse.foldLeft(lit("und")) { case (els, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(els)
    }
  }

  /** Polynomial rolling-hash fingerprint over the doc's characters:
    * h = (h * 31 + code) mod 1e9+7. Stays below 2^35 at every step so the
    * identical arithmetic is expressible in any engine with 64-bit ints
    * (the DuckDB oracle replays it with list_reduce). */
  def fingerprint(text: Column): Column = {
    val codes = transform(split(text, ""), ch => ascii(ch).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => (acc * 31L + c) % 1000000007L)
  }

  /** Redact every regex match in `text` with `token` — the PII-scrub
    * primitive (account numbers, emails, phones) run over raw text before
    * it can enter a training corpus. Pure codegen'd projection
    * (regexp_replace), no shuffle. Keep patterns in the portable subset
    * (char classes, quantifiers, alternation) so the DuckDB/RE2 oracle
    * replays them identically. */
  def redact(text: Column, pattern: String, token: String): Column =
    regexp_replace(text, pattern, token)

  /** Per-group redaction report: rows scanned, total matches hit, and the
    * DISTINCT value count before vs after redaction. The before/after
    * collapse is the point — identifier noise (serial numbers, user ids)
    * makes every row unique; redaction restores the real cardinality,
    * which is what dedup and domain-cap accounting should run on.
    *
    * One scan, one group-by; the distinct counts ride md5 fingerprints so
    * the partial aggregate moves 16-byte keys, not full texts. */
  def redactReport(df: DataFrame, groupCol: String, textCol: String,
                   pattern: String, token: String = "[ID]"): DataFrame = {
    val red = redact(col(textCol), pattern, token)
    graft.Tables.widen(df)
      .select(col(groupCol).as("grp"), col(textCol).as("t"),
        regexp_count(col(textCol), lit(pattern)).as("nm"), red.as("r"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("nm")).cast("long").as("n_matches"),
        countDistinct(md5(col("t"))).cast("long").as("distinct_before"),
        countDistinct(md5(col("r"))).cast("long").as("distinct_after"))
      .withColumnRenamed("grp", groupCol)
  }

  /** Within-document repetition metrics (the Gopher/MassiveText repetition
    * filter family, adapted to word granularity since the corpus has no line
    * structure): for each doc
    *   - `top_word_frac`   — occurrences of the single most frequent word /
    *     total words (MassiveText's "fraction of chars in most common word"
    *     sibling);
    *   - `dup_word_frac`   — 1 - distinct words / total words;
    *   - `dup_trigram_frac`— fraction of trigram OCCURRENCES whose trigram
    *     appears more than once in the doc (MassiveText's duplicate-n-gram
    *     fraction);
    *   - `repetitive`      — the filter verdict at the given thresholds.
    *
    * Shape: two exploded counts (words, trigrams) keyed by doc, aggregated
    * back to one row per doc — map-side partial counting, the per-doc key
    * keeps both shuffles on the same natural key, and nothing is ever
    * collected. Docs shorter than 3 tokens have no trigrams: their
    * `dup_trigram_frac` is 0. */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String,
                        topWordMax: Double = 0.1,
                        dupTrigramMax: Double = 0.4): DataFrame = {
    graft.functions.TextHashFunctions.register(df.sparkSession)
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
    val words = toks.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_words"),
        max(col("c")).as("top_c"))
    val tris = df.select(col(idCol).as("doc_id"), explode(
        graft.functions.TextHashFunctions.shingles(col(textCol), 3)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_tri"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_tri"))
    val out = words.join(tris, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_words").cast("long").as("n_words"),
        round(col("top_c").cast("double") / col("n_words"), 4).as("top_word_frac"),
        round(when(coalesce(col("n_tri"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("dup_tri").cast("double") / col("n_tri")), 4)
          .as("dup_trigram_frac"))
    out.withColumn("repetitive",
      col("top_word_frac") > topWordMax || col("dup_trigram_frac") > dupTrigramMax)
  }

  /** Per-source tokenizer-fertility report: subword tokens per whitespace
    * word (the "fertility" every tokenizer eval tracks — high fertility =
    * the tokenizer fragments this source's text, so its documents cost more
    * sequence length per word), plus chars/bytes per subword. All three
    * numerators are zero-shuffle codegen'd projections ([[tokenCount]],
    * [[subwordCount]], `octet_length`); the only shuffle is the
    * sources-bounded final aggregate. Token-budget planning runs on
    * exactly this table: budget_tokens ≈ n_words × fertility per source. */
  def fertilityReport(df: DataFrame, srcCol: String, textCol: String): DataFrame =
    df.select(col(srcCol).as("source"),
        tokenCount(col(textCol)).cast("long").as("w"),
        subwordCount(col(textCol)).cast("long").as("s"),
        length(col(textCol)).cast("long").as("ch"),
        octet_length(col(textCol)).cast("long").as("by"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("w").as("n_words"), sum("s").as("n_subwords"),
        round(sum("s").cast("double") / sum("w"), 4).as("fertility"),
        round(sum("ch").cast("double") / sum("s"), 4).as("chars_per_token"),
        round(sum("by").cast("double") / sum("s"), 4).as("bytes_per_token"))

  /** One-pass document profile used by `SparkEntry`. */
  def profile(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("token_count", tokenCount(col(textCol)))
      .withColumn("subword_count", subwordCount(col(textCol)))
      .withColumn("punct_ratio", punctRatio(col(textCol)))
      .withColumn("stopword_ratio", stopwordRatio(col(textCol)))
      .withColumn("mean_word_len", meanWordLen(col(textCol)))
      .withColumn("quality_score", qualityScore(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))

  /** Per-group readability report: Flesch reading ease and Flesch–Kincaid
    * grade from corpus-level (words, sentences, syllables) totals — the
    * classic audience-level proxy a curation mix consults next to the
    * statistical quality score (a corpus can be high-"quality" and still
    * uniformly graduate-level, or vice versa). Syllables use the standard
    * cheap heuristic (maximal vowel-[aeiouy] groups — off by a constant
    * factor on edge words, which cancels in cross-group COMPARISON, the
    * actual use); sentences are `[.!?]+` runs, floored at one per
    * document. All three counts are exact integers from ONE codegen'd
    * regexp pass, so the two final formulas are the only float ops. */
  def readabilityReport(df: DataFrame, groupCol: String,
                        textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val perDoc = df.filter(col(textCol).isNotNull)
      .select(col(groupCol),
        size(graft.operators.Dedup.tokens(col(textCol))).as("w"),
        greatest(lit(1L), regexp_count(t, lit("[.!?]+"))).as("st"),
        regexp_count(t, lit("[aeiouy]+")).as("sy"))
    val wps = col("ws").cast("double") / col("sts").cast("double")
    val spw = col("sys").cast("double") / col("ws").cast("double")
    perDoc.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("w")).cast("long").as("ws"),
        sum(col("st")).cast("long").as("sts"),
        sum(col("sy")).cast("long").as("sys"))
      .select(col(groupCol), col("n_docs"),
        round(wps, 4).as("words_per_sentence"),
        round(spw, 4).as("syllables_per_word"),
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4)
          .as("flesch_ease"),
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4)
          .as("fk_grade"))
  }

  /** Confusion matrix of [[langId]] against a labeled column: one row per
    * (true, predicted) cell with its count and the cell's share of the
    * TRUE class (row-normalized — the recall decomposition: the diagonal
    * share IS per-class recall, and every off-diagonal row says exactly
    * where that language's documents leak). The detector-eval every
    * heuristic classifier needs before it gates a corpus — aggregate
    * accuracy hides the one language the marker list misses. One
    * projection + one aggregate + a per-class count window. */
  def langConfusion(df: DataFrame, textCol: String,
                    labelCol: String): DataFrame = {
    val cells = df.filter(col(labelCol).isNotNull)
      .select(col(labelCol).as("true_lang"),
        langId(col(textCol)).as("pred_lang"))
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).cast("long").as("n"))
    val wt = Window.partitionBy(col("true_lang"))
    cells
      .withColumn("n_true", sum(col("n")).over(wt))
      .select(col("true_lang"), col("pred_lang"), col("n"),
        round(col("n").cast("double") / col("n_true").cast("double"), 4)
          .as("share_of_true"))
  }

  /** Character-level corpus stats per source: codepoint-distribution
    * entropy, distinct-codepoint vocabulary, and the non-ASCII share —
    * the mojibake/wrong-encoding tripwire that token-level diversity
    * (lexicalDiversity) can't see: double-encoded UTF-8 explodes the
    * char vocabulary and entropy long before tokens look wrong, and a
    * non-ASCII share that disagrees with the source's declared language
    * mix is the first question to ask of a new crawl.
    *
    * Entropy = log₂N − Σc·log₂c/N over the (source × codepoint) frame —
    * the histogram is VOCABULARY-bounded, never char-rows; the Σc·log₂c
    * fold runs over the SORTED per-source codepoint list so the fp sum
    * order is engine-identical (the q267 pattern). Non-ASCII and totals
    * are exact integers. */
  def charStats(df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val chars = df
      .select(col(srcCol).as("src"),
        explode(split(col(textCol), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy(col("src"), col("ch"))
      .agg(count(lit(1)).cast("long").as("c"))
    chars.groupBy(col("src"))
      .agg(sum(col("c")).cast("long").as("n_chars"),
        count(lit(1)).cast("long").as("n_distinct_chars"),
        sum(when(ascii(col("ch")) > 127 || ascii(col("ch")) < 0, col("c"))
          .otherwise(0L)).cast("long").as("n_non_ascii"),
        sort_array(collect_list(struct(col("ch"), col("c")))).as("ls"))
      .select(col("src").as(srcCol), col("n_chars"),
        col("n_distinct_chars"),
        round(
          log2(col("n_chars").cast("double")) -
            aggregate(col("ls"), lit(0.0), (a, e) =>
              a + e("c").cast("double") * log2(e("c").cast("double"))) /
              col("n_chars").cast("double"), 4).as("entropy_bits"),
        round(col("n_non_ascii").cast("double") /
          col("n_chars").cast("double"), 4).as("non_ascii_ratio"))
  }

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm)
    * over word `k`-shingle hashes: in every window of `w` consecutive
    * shingle hashes, select the leftmost minimum — guaranteeing any shared
    * run of ≥ w+k−1 words leaves at least one COMMON selected hash in both
    * documents, at an expected density of 2/(w+1). The per-source report:
    * shingle/fingerprint volumes, realized density, and how many documents
    * share at least one fingerprint with ANY other document (the
    * plagiarism/mirror-content triage number).
    *
    * Scale shape: selection is a per-document array pipeline over the
    * codegen'd shingle-hash array (O(w·len) per doc, no joins); the only
    * shuffles are the per-source aggregate and the fingerprint-frequency
    * join, both on bounded-cardinality keys (fingerprint space is
    * hash-bounded; a shared-hash hub would be a stop-shingle — the q118
    * stoplist pattern applies before the join at real scale). */
  def winnowingReport(df: DataFrame, idCol: String, srcCol: String,
                      textCol: String, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && k <= 16 && w >= 2 && w <= 64, "k in [1,16], w in [2,64]")
    val per = df
      .select(col(idCol).as("doc_id"), col(srcCol).as("src"),
        graft.functions.TextHashFunctions.shingleHashes(col(textCol), k)
          .as("hs"))
      .withColumn("m", size(col("hs")).cast("long"))
      // leftmost-min per window, positions deduped: selected iff minimal in
      // at least one window (array lambdas; no per-row state beyond the doc)
      .withColumn("selpos", expr(
        s"""CASE WHEN m >= $w THEN array_distinct(transform(
           |  sequence(cast($w as bigint), m),
           |  e -> e - $w + array_position(
           |    slice(hs, cast(e - ${w - 1} as int), $w),
           |    array_min(slice(hs, cast(e - ${w - 1} as int), $w)))))
           |ELSE cast(array() as array<bigint>) END""".stripMargin))
    val perSrc = per.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("m")).cast("long").as("shingles"),
        sum(size(col("selpos"))).cast("long").as("fingerprints"))
    val fp = per.select(col("doc_id"), col("src"),
      explode(expr(
        "array_distinct(transform(selpos, p -> element_at(hs, cast(p as int))))"))
        .as("h"))
    val cnt = fp.groupBy(col("h")).agg(count(lit(1)).cast("long").as("dc"))
    val shared = fp.join(cnt, Seq("h"))
      .groupBy(col("doc_id"), col("src")).agg(max(col("dc")).as("mx"))
      .filter(col("mx") > 1)
      .groupBy(col("src")).agg(count(lit(1)).cast("long").as("shared_docs"))
    perSrc.join(shared, Seq("src"), "left")
      .select(col("src").as(srcCol), col("n_docs"), col("shingles"),
        col("fingerprints"),
        round(when(col("shingles") > 0,
          col("fingerprints").cast("double") /
            col("shingles").cast("double")), 4).as("density"),
        coalesce(col("shared_docs"), lit(0L)).as("shared_docs"))
  }
}
