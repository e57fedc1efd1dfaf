package graft

import org.apache.spark.sql.functions._

/** The table-valued SQL facade: registry enumeration (the q76-style
  * coverage assertion for the report surface) plus live `spark.sql`
  * round-trips through `graft_report(...)` compared against the direct
  * Scala calls they must equal. */
class GraftReportsSpec extends SparkSpec {
  import spark.implicits._

  test("report registry enumerates the full q244-q298 report surface") {
    val want = Set(
      // Stats
      "poisson_bootstrap_se", "bootstrap_median_ci", "mahalanobis_outliers",
      "group_auc", "msprt", "yuen_trimmed_t", "post_stratified_mean",
      "diff_in_diff", "emd_drift", "bradley_terry", "jackknife_group_se",
      "spearman_by_group", "range_partition_audit", "ipf_raking",
      "funnel_conversion_test", "brier_decomposition", "correlation_matrix",
      "ips_policy_value", "mix_shift_decomposition", "krippendorff_alpha",
      "pr_curve", "kendall_tau_b", "pettitt_changepoint", "pareto_frontier",
      // TimeSeries
      "theil_sen", "mann_kendall", "ewma", "seasonal_decompose",
      "holt_forecast_eval", "autocorrelation", "seasonal_forecast_eval",
      // TextAnalysis
      "lang_confusion", "char_stats", "winnowing_report",
      // Sketches
      "topk_churn",
      // Similarity
      "knn_classifier_eval", "label_anisotropy", "farthest_point_sample",
      "triplet_eval",
      // Sampling
      "negative_sampling", "shard_mixing_report",
      // Graph
      "bfs_hops", "degree_assortativity",
      // EventOps
      "lateness_profile", "growth_accounting",
      // DataQuality
      "rare_category_collapse", "feature_hash_audit", "dp_noisy_counts",
      // Corpus
      "bpe_learn", "bpe_encode",
      // wave 2: pre-q244 LLM-pipeline reports
      "exact_dedup", "exact_survivors", "minhash_near_dups",
      "ngram_jaccard_pairs", "simhash_near_dups", "simhash64_near_dups",
      "prefix_jaccard_pairs", "containment_pairs", "cross_containment_pairs",
      "paragraph_dedup",
      "connected_components", "cluster_stats", "semantic_dedup",
      "dup_ngram_fraction", "cross_source_dup_matrix", "brute_force_topk",
      "quality_logit", "readability_report", "repetition_metrics",
      "text_profile", "redact_report", "bm25_top_docs", "chunk_by_tokens",
      "zipf_fit", "source_kl_report", "lexical_diversity", "heaps_fit",
      "dsir_weights",
      // Multimodal + Media (r14)
      "pixel_stats", "image_dhash_pairs", "image_near_dups",
      "resize_stats", "audio_stats", "video_headers",
      // r15: band-load pre-flight + stage-two video filter
      "hamming64_bucket_profile", "video_tracks")
    assert(GraftReports.reports.keySet == want,
      s"registry drift: missing ${want.diff(GraftReports.reports.keySet)}, " +
        s"extra ${GraftReports.reports.keySet.diff(want)}")
    assert(GraftReports.reports.size == 86)
    // every report declares its arguments (the SQL user's documentation)
    GraftReports.reports.foreach { case (name, rep) =>
      assert(rep.argNames.nonEmpty, s"$name declares no arguments")
      assert(rep.argNames.distinct == rep.argNames,
        s"$name has duplicate argument names")
    }
  }

  test("extensions inject graft_report into the table-function registry") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(org.apache.spark.sql.ExtensionsProbe
      .registeredTableFunctions(ext).contains("graft_report"))
  }

  test("graft_report TVF equals the direct Scala call (single-table reports)") {
    GraftReports.register(spark)
    val events = Seq(
      (1L, "2024-01-01 10:00:00", "view", 2.0),
      (1L, "2024-01-03 10:00:00", "view", 3.0),
      (2L, "2024-01-01 11:00:00", "view", 5.0),
      (2L, "2024-01-20 11:00:00", "purchase", 7.0),
      (3L, "2024-02-01 09:00:00", "view", 1.0))
      .toDF("user_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    events.createOrReplaceTempView("graft_reports_events")
    val viaSql = spark.sql(
      """SELECT * FROM graft_report('growth_accounting',
        |  'graft_reports_events', 'user_id', 'ts', '7')""".stripMargin)
    val direct = graft.operators.EventOps
      .growthAccounting(events, "user_id", "ts", gapDays = 7)
    assert(rowsOf(viaSql) == rowsOf(direct))
    // a report with expression-typed arguments
    val viaSql2 = spark.sql(
      """SELECT * FROM graft_report('ipf_raking', 'graft_reports_events',
        |  'event_type', 'pmod(user_id, 2)', '3')""".stripMargin)
    val direct2 = graft.operators.Stats.ipfRaking(events,
      col("event_type"), pmod(col("user_id"), lit(2L)), iters = 3)
    assert(rowsOf(viaSql2) == rowsOf(direct2))
  }

  test("graft_report reaches paragraph_dedup with a separator argument") {
    GraftReports.register(spark)
    val docs = Seq(
      (1L, "alpha beta|boiler plate|gamma"),
      (2L, "boiler plate|delta"),
      (3L, "alpha beta"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("graft_reports_docs")
    val viaSql = spark.sql(
      """SELECT * FROM graft_report('paragraph_dedup',
        |  'graft_reports_docs', 'doc_id', 'text', '|')""".stripMargin)
    val direct = graft.operators.Dedup
      .paragraphDedup(docs, "doc_id", "text", sep = "|")
    assert(rowsOf(viaSql) == rowsOf(direct))
    val m = viaSql.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "alpha beta|boiler plate|gamma" &&
      m(2L) == "delta" && m(3L) == "")
  }

  test("graft_report resolves second-table arguments against the session") {
    GraftReports.register(spark)
    val pop = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 20.0),
      ("b", 30.0)).toDF("stratum", "v")
    val samp = Seq(("a", 2.0), ("a", 4.0), ("b", 25.0), ("b", 15.0))
      .toDF("stratum", "v")
    pop.createOrReplaceTempView("graft_reports_pop")
    samp.createOrReplaceTempView("graft_reports_samp")
    val viaSql = spark.sql(
      """SELECT * FROM graft_report('post_stratified_mean',
        |  'graft_reports_pop', 'stratum', 'v',
        |  'graft_reports_samp')""".stripMargin)
    val direct = graft.operators.Stats.postStratifiedMean(pop, "stratum",
      "v", samp)
    assert(rowsOf(viaSql) == rowsOf(direct))
  }

  test("graft_report reaches the dedup surface (wave-2 reports)") {
    GraftReports.register(spark)
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "entirely different text here"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("graft_reports_docs")
    val viaSql = spark.sql(
      """SELECT * FROM graft_report('exact_dedup', 'graft_reports_docs',
        |  'text', 'doc_id')""".stripMargin)
    assert(rowsOf(viaSql) ==
      rowsOf(graft.operators.Dedup.exact(docs, "text", "doc_id")))
    // a two-table dedup report: needles vs haystack
    val needles = Seq((100L, "quick brown")).toDF("doc_id", "text")
    needles.createOrReplaceTempView("graft_reports_needles")
    val viaSql2 = spark.sql(
      """SELECT * FROM graft_report('cross_containment_pairs',
        |  'graft_reports_needles', 'graft_reports_docs',
        |  'text', 'doc_id', '0.9', '1')""".stripMargin)
    assert(rowsOf(viaSql2) == rowsOf(graft.operators.Dedup
      .crossContainmentPairs(needles, docs, "text", "doc_id", 0.9, 1)))
  }

  test("eager-training reports train once across EXPLAIN + repeated collects") {
    GraftReports.register(spark)
    val docs = Seq((1L, "low lower lowest"), (2L, "low lowest newest"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("graft_reports_bpe")
    GraftReports.clearCache()
    val before = GraftReports.buildCounts.getOrElse("bpe_learn", 0L)
    val q = "SELECT * FROM graft_report('bpe_learn', " +
      "'graft_reports_bpe', 'text', '3', '8')"
    // EXPLAIN analyzes (and under the old eager shape would TRAIN); the
    // two collects re-analyze the same call — one build total
    spark.sql("EXPLAIN " + q).collect()
    val r1 = rowsOf(spark.sql(q))
    val r2 = rowsOf(spark.sql(q))
    assert(r1 == r2 && r1.nonEmpty)
    assert(GraftReports.buildCounts.getOrElse("bpe_learn", 0L) == before + 1,
      "EXPLAIN + collect + re-collect must build the report exactly once")
    // a re-created view (different data → different canonicalized plan)
    // is a cache MISS: the model retrains rather than serving stale merges
    Seq((1L, "aa ab aa ab aa")).toDF("doc_id", "text")
      .createOrReplaceTempView("graft_reports_bpe")
    val r3 = rowsOf(spark.sql(q))
    assert(GraftReports.buildCounts.getOrElse("bpe_learn", 0L) == before + 2)
    assert(r3 != r1, "retrained model must reflect the new corpus")
  }

  test("graft_report reaches the real pixel decode (pixel_stats)") {
    GraftReports.register(spark)
    graft.operators.Multimodal.Fixtures.df(spark)
      .createOrReplaceTempView("graft_reports_images")
    Seq.tabulate(23)(i => Tuple1(i.toLong % 10)).toDF("img_key")
      .createOrReplaceTempView("graft_reports_media_rows")
    val viaSql = spark.sql(
      """SELECT * FROM graft_report('pixel_stats',
        |  'graft_reports_media_rows', 'img_key',
        |  'graft_reports_images')""".stripMargin)
    val direct = graft.operators.Multimodal.pixelStatsReport(
      spark.table("graft_reports_media_rows"), "img_key",
      graft.operators.Multimodal.Fixtures.df(spark))
    assert(rowsOf(viaSql) == rowsOf(direct))
    assert(viaSql.count() == 10)
  }

  test("graft_report errors name the report and its expected arguments") {
    GraftReports.register(spark)
    Seq((1L, 2.0)).toDF("id", "v")
      .createOrReplaceTempView("graft_reports_tiny")
    val eUnknown = intercept[Exception] {
      spark.sql("SELECT * FROM graft_report('no_such_report', " +
        "'graft_reports_tiny')").collect()
    }
    assert(eUnknown.getMessage.contains("unknown graft report"))
    val eArity = intercept[Exception] {
      spark.sql("SELECT * FROM graft_report('kendall_tau_b', " +
        "'graft_reports_tiny', 'id')").collect()
    }
    assert(eArity.getMessage.contains("kendall_tau_b") &&
      eArity.getMessage.contains("groupCol"))
  }
}
