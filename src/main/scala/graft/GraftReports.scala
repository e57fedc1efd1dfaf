package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._

import graft.operators._

/** SQL facade over the DataFrame-shaped REPORT operators — the surface a
  * SQL-first user reaches as a table-valued function:
  *
  * {{{
  *   SELECT * FROM graft_report('growth_accounting', 'events_view',
  *                              'user_id', 'ts', '7')
  * }}}
  *
  * The scalar/aggregate expression surface rides the function registry
  * ([[GraftExtensions]], `graft_cosine` et al.); reports return TABLES, so
  * they ride the TABLE function registry instead — same injection point
  * (`spark.sql.extensions=graft.GraftExtensions`), same runtime
  * alternative ([[GraftReports.register]], the `Registry.ensure` twin).
  *
  * Contract: `graft_report(name, table, args...)` — every argument a
  * string literal (resolved at analysis time), `table` any table or temp
  * view, and `args` matching the report's declared [[Report.argNames]]
  * positionally. Column-typed parameters accept full SQL expressions
  * (`'pmod(user_id, 2) = 1'`); list-typed parameters are comma-separated.
  * Errors name the report and its expected arguments.
  *
  * Reports whose operators train eagerly (BPE, farthest-point, IPF, …)
  * do that work when the calling query is ANALYZED — and SQL re-analyzes
  * liberally (an `EXPLAIN`, a view re-resolution, a second reference).
  * The builder therefore MEMOIZES per (name, args, canonicalized input
  * plan), bounded LRU: re-analysis of the same call returns the cached
  * plan without re-running the training jobs. The canonicalized-plan key
  * means a re-created temp view or a refreshed table (new relation) is a
  * cache MISS — retrained, as it should be; mutating files in place
  * without `REFRESH TABLE` serves the stale model, the same staleness
  * Spark's own relation cache has. [[clearCache]] drops everything.
  */
object GraftReports {

  /** One SQL-reachable report: declared argument names (spec-enumerable,
    * error-message fodder) and the builder from (input, args). */
  final case class Report(argNames: Seq[String],
                          build: (DataFrame, Seq[String]) => DataFrame)

  private def r(argNames: String*)(build: (DataFrame, Seq[String]) => DataFrame)
      : Report = Report(argNames, build)

  /** Second-table arguments resolve against the input's own session, so
    * the facade works identically under `SparkSession.active` (TVF path)
    * and an explicit session (Scala path). */
  private def tbl(df: DataFrame, name: String): DataFrame =
    df.sparkSession.table(name)

  /** The registry: every post-q243 Stats/EventOps/TimeSeries/quality
    * report from the gate surface, keyed by snake_case name. */
  val reports: Map[String, Report] = Map(
    // ---- Stats: experimentation / evaluation ----
    "poisson_bootstrap_se" -> r("groupCol", "idCol", "valueCol", "b")(
      (df, a) => Stats.poissonBootstrapSE(df, a(0), a(1), a(2), a(3).toInt)),
    "bootstrap_median_ci" -> r("groupCol", "idCol", "valueCol", "b")(
      (df, a) => Stats.bootstrapMedianCI(df, a(0), a(1), a(2), a(3).toInt)),
    "mahalanobis_outliers" -> r("idCol", "featuresCsv", "topK")(
      (df, a) => Stats.mahalanobisOutliers(df, a(0),
        a(1).split(",").map(_.trim).toSeq, a(2).toInt)),
    "group_auc" -> r("groupCol", "scoreExpr", "labelExpr")(
      (df, a) => Stats.groupAuc(df, a(0), expr(a(1)), expr(a(2)))),
    "msprt" -> r("groupCol", "armExpr", "valueCol", "tau2")(
      (df, a) => Stats.msprt(df, a(0), expr(a(1)), a(2), a(3).toDouble)),
    "yuen_trimmed_t" -> r("armExpr", "valueCol", "trim")(
      (df, a) => Stats.yuenTrimmedT(df, expr(a(0)), a(1), a(2).toDouble)),
    "post_stratified_mean" -> r("strataCol", "valueCol", "sampleTable")(
      (df, a) => Stats.postStratifiedMean(df, a(0), a(1), tbl(df, a(2)))),
    "diff_in_diff" -> r("treatExpr", "postExpr", "valueCol")(
      (df, a) => Stats.diffInDiff(df, expr(a(0)), expr(a(1)), a(2))),
    "emd_drift" -> r("groupCol", "valueCol", "nBins")(
      (df, a) => Stats.emdDrift(df, a(0), a(1), a(2).toInt)),
    "bradley_terry" -> r("winnerCol", "loserCol", "iters")(
      (df, a) => Stats.bradleyTerry(df, a(0), a(1), a(2).toInt)),
    "jackknife_group_se" -> r("unitExpr", "valueCol", "nGroups")(
      (df, a) => Stats.jackknifeGroupSE(df, expr(a(0)), a(1), a(2).toInt)),
    "spearman_by_group" -> r("groupCol", "xCol", "yCol")(
      (df, a) => Stats.spearmanByGroup(df, a(0), a(1), a(2))),
    "range_partition_audit" -> r("idCol", "valueCol", "nParts", "samplePct")(
      (df, a) => Stats.rangePartitionAudit(df, a(0), a(1), a(2).toInt,
        a(3).toInt)),
    "ipf_raking" -> r("rowExpr", "colExpr", "iters")(
      (df, a) => Stats.ipfRaking(df, expr(a(0)), expr(a(1)), a(2).toInt)),
    "funnel_conversion_test" ->
      r("userCol", "tsCol", "typeCol", "eventA", "eventB", "armBExpr")(
        (df, a) => Stats.funnelConversionTest(df, a(0), a(1), a(2), a(3),
          a(4), expr(a(5)))),
    "brier_decomposition" -> r("scoreCol", "labelCol", "nBins")(
      (df, a) => Stats.brierDecomposition(df, a(0), a(1), a(2).toInt)),
    "correlation_matrix" -> r("colsCsv")(
      (df, a) => Stats.correlationMatrix(df,
        a(0).split(",").map(_.trim).toSeq)),
    "ips_policy_value" -> r("contextExpr", "actionCol", "rewardCol")(
      (df, a) => Stats.ipsPolicyValue(df, expr(a(0)), a(1), a(2))),
    "mix_shift_decomposition" -> r("segmentCol", "periodBExpr", "valueCol")(
      (df, a) => Stats.mixShiftDecomposition(df, a(0), expr(a(1)), a(2))),
    "krippendorff_alpha" -> r("unitCol", "ratingCol")(
      (df, a) => Stats.krippendorffAlpha(df, a(0), a(1))),
    "pr_curve" -> r("scoreCol", "labelCol", "nBins")(
      (df, a) => Stats.prCurve(df, a(0), a(1), a(2).toInt)),
    "kendall_tau_b" -> r("groupCol", "xCol", "yCol")(
      (df, a) => Stats.kendallTauB(df, a(0), a(1), a(2))),
    "pettitt_changepoint" -> r("keyCol", "tsCol")(
      (df, a) => Stats.pettittChangepoint(df, a(0), a(1))),
    "pareto_frontier" -> r("idCol", "xCol", "yCol")(
      (df, a) => Stats.paretoFrontier(df, a(0), a(1), a(2))),
    // ---- TimeSeries ----
    "theil_sen" -> r("keyCol", "tsCol", "valueCol")(
      (df, a) => TimeSeries.theilSen(df, a(0), a(1), a(2))),
    "mann_kendall" -> r("keyCol", "tsCol", "valueCol")(
      (df, a) => TimeSeries.mannKendall(df, a(0), a(1), a(2))),
    "ewma" -> r("keyCol", "tsCol", "valueCol", "alpha")(
      (df, a) => TimeSeries.ewma(df, a(0), a(1), a(2), a(3).toDouble)),
    "seasonal_decompose" -> r("keyCol", "tsCol")(
      (df, a) => TimeSeries.seasonalDecompose(df, a(0), a(1))),
    "holt_forecast_eval" -> r("keyCol", "tsCol", "alpha", "beta")(
      (df, a) => TimeSeries.holtForecastEval(df, a(0), a(1), a(2).toDouble,
        a(3).toDouble)),
    "autocorrelation" -> r("keyCol", "tsCol", "maxLag")(
      (df, a) => TimeSeries.autocorrelation(df, a(0), a(1), a(2).toInt)),
    "seasonal_forecast_eval" -> r("keyCol", "tsCol", "season")(
      (df, a) => TimeSeries.seasonalForecastEval(df, a(0), a(1), a(2).toInt)),
    // ---- TextAnalysis ----
    "lang_confusion" -> r("textCol", "labelCol")(
      (df, a) => TextAnalysis.langConfusion(df, a(0), a(1))),
    "char_stats" -> r("srcCol", "textCol")(
      (df, a) => TextAnalysis.charStats(df, a(0), a(1))),
    "winnowing_report" -> r("idCol", "srcCol", "textCol", "k", "w")(
      (df, a) => TextAnalysis.winnowingReport(df, a(0), a(1), a(2),
        a(3).toInt, a(4).toInt)),
    // ---- Sketches ----
    "topk_churn" -> r("textCol", "periodBExpr", "n", "topK")(
      (df, a) => Sketches.topKChurn(df, a(0), expr(a(1)), a(2).toInt,
        a(3).toInt)),
    // ---- Similarity / embeddings ----
    "knn_classifier_eval" ->
      r("queryPredExpr", "k", "idCol", "vecCol", "labelCol")(
        (df, a) => Similarity.knnClassifierEval(df, expr(a(0)), a(1).toInt,
          a(2), a(3), a(4))),
    "label_anisotropy" -> r("vecCol", "labelCol")(
      (df, a) => Similarity.labelAnisotropy(df, a(0), a(1))),
    "farthest_point_sample" -> r("k", "idCol", "vecCol")(
      (df, a) => Similarity.farthestPointSample(df, a(0).toInt, a(1), a(2))),
    "triplet_eval" -> r("idCol", "vecCol", "labelCol")(
      (df, a) => Similarity.tripletEval(df, a(0), a(1), a(2))),
    // ---- Sampling ----
    "negative_sampling" ->
      r("userCol", "itemCol", "catalogTable", "catalogKey", "k")(
        (df, a) => Sampling.negativeSampling(df, a(0), a(1), tbl(df, a(2)),
          a(3), a(4).toInt)),
    "shard_mixing_report" -> r("idCol", "srcCol", "nShards")(
      (df, a) => Sampling.shardMixingReport(df, a(0), a(1), a(2).toInt)),
    // ---- Graph ----
    "bfs_hops" -> r("seedsTable", "maxHops", "idA", "idB")(
      (df, a) => Graph.bfsHops(df, tbl(df, a(0)), a(1).toInt, a(2), a(3))),
    "degree_assortativity" -> r("leftCol", "rightCol")(
      (df, a) => Graph.degreeAssortativity(df, a(0), a(1))),
    // ---- EventOps ----
    "lateness_profile" -> r("keyCol", "arrivalCol", "tsCol")(
      (df, a) => EventOps.latenessProfile(df, a(0), a(1), a(2))),
    "growth_accounting" -> r("userCol", "tsCol", "gapDays")(
      (df, a) => EventOps.growthAccounting(df, a(0), a(1), a(2).toInt)),
    // ---- DataQuality ----
    "rare_category_collapse" -> r("catCol", "minSupport")(
      (df, a) => DataQuality.rareCategoryCollapse(df, a(0), a(1).toLong)),
    "feature_hash_audit" -> r("catCol", "bits")(
      (df, a) => DataQuality.featureHashAudit(df, a(0), a(1).toInt)),
    "dp_noisy_counts" -> r("groupCol", "seed", "epsilon")(
      (df, a) => DataQuality.dpNoisyCounts(df, a(0), a(1), a(2).toDouble)),
    // ---- Corpus ----
    "bpe_learn" -> r("textCol", "nMerges", "batch")(
      (df, a) => Corpus.bpeLearn(df, a(0), a(1).toInt, a(2).toInt)),
    "bpe_encode" -> r("textCol", "groupCol", "nMerges", "batch")(
      (df, a) => Corpus.bpeEncode(df, a(0), a(1), a(2).toInt, a(3).toInt)),

    // ---- wave 2: the pre-q244 LLM-pipeline reports, same contract ----
    // Dedup
    "exact_dedup" -> r("textCol", "idCol")(
      (df, a) => Dedup.exact(df, a(0), a(1))),
    "exact_survivors" -> r("textCol", "idCol")(
      (df, a) => Dedup.exactSurvivors(df, a(0), a(1))),
    "minhash_near_dups" ->
      r("textCol", "idCol", "threshold", "bands", "rowsPerBand", "shingleK")(
        (df, a) => Dedup.verifiedNearDups(df, a(0), a(1), a(2).toDouble,
          a(3).toInt, a(4).toInt, a(5).toInt)),
    "ngram_jaccard_pairs" ->
      r("textCol", "idCol", "shingleK", "threshold", "maxPostings")(
        (df, a) => Dedup.ngramJaccardPairs(df, a(0), a(1), a(2).toInt,
          a(3).toDouble, a(4).toInt)),
    "simhash_near_dups" -> r("textCol", "idCol", "maxHamming")(
      (df, a) => Dedup.simHashNearDups(df, a(0), a(1), a(2).toInt)),
    "simhash64_near_dups" -> r("textCol", "idCol", "maxHamming")(
      (df, a) => Dedup.simHashNearDups64(df, a(0), a(1), a(2).toInt)),
    "prefix_jaccard_pairs" -> r("textCol", "idCol", "threshold", "shingleK")(
      (df, a) => Dedup.prefixFilterJaccardPairs(df, a(0), a(1),
        a(2).toDouble, a(3).toInt)),
    "containment_pairs" -> r("textCol", "idCol", "threshold", "shingleK")(
      (df, a) => Dedup.containmentPairs(df, a(0), a(1), a(2).toDouble,
        a(3).toInt)),
    "cross_containment_pairs" ->
      r("haystackTable", "textCol", "idCol", "threshold", "shingleK")(
        (df, a) => Dedup.crossContainmentPairs(df, tbl(df, a(0)), a(1),
          a(2), a(3).toDouble, a(4).toInt)),
    "paragraph_dedup" -> r("idCol", "textCol", "sep")(
      (df, a) => Dedup.paragraphDedup(df, a(0), a(1), a(2))),
    "connected_components" -> r("idA", "idB", "maxIter")(
      (df, a) => Dedup.connectedComponents(df, a(0), a(1), a(2).toInt)),
    "cluster_stats" -> r("pairsTable", "idA", "idB", "metricCol")(
      (df, a) => Dedup.clusterStats(df, tbl(df, a(0)), a(1), a(2), a(3))),
    "semantic_dedup" -> r("idCol", "vecCol", "nClusters", "threshold")(
      (df, a) => Dedup.semanticDedup(df, a(0), a(1), a(2).toInt,
        a(3).toDouble)),
    "dup_ngram_fraction" -> r("textCol", "idCol", "shingleK", "minDf")(
      (df, a) => Dedup.dupNgramFraction(df, a(0), a(1), a(2).toInt,
        a(3).toInt)),
    "cross_source_dup_matrix" ->
      r("textCol", "idCol", "srcCol", "threshold")(
        (df, a) => Dedup.crossSourceDupMatrix(df, a(0), a(1), a(2),
          a(3).toDouble)),
    // Similarity
    "brute_force_topk" ->
      r("queriesTable", "k", "corpusId", "corpusVec", "queryId", "queryVec")(
        (df, a) => Similarity.bruteForceTopK(df, tbl(df, a(0)), a(1).toInt,
          a(2), a(3), a(4), a(5))),
    // TextAnalysis
    "quality_logit" -> r("idCol", "textCol")(
      (df, a) => TextAnalysis.qualityLogit(df, a(0), a(1))),
    "readability_report" -> r("groupCol", "textCol")(
      (df, a) => TextAnalysis.readabilityReport(df, a(0), a(1))),
    "repetition_metrics" ->
      r("idCol", "textCol", "topWordMax", "dupTrigramMax")(
        (df, a) => TextAnalysis.repetitionMetrics(df, a(0), a(1),
          a(2).toDouble, a(3).toDouble)),
    "text_profile" -> r("textCol")(
      (df, a) => TextAnalysis.profile(df, a(0))),
    "redact_report" -> r("groupCol", "textCol", "pattern", "token")(
      (df, a) => TextAnalysis.redactReport(df, a(0), a(1), a(2), a(3))),
    "bm25_top_docs" -> r("idCol", "textCol", "queryTermsCsv", "k")(
      (df, a) => TextAnalysis.bm25TopDocs(df, a(0), a(1),
        a(2).split(",").map(_.trim).toSeq, a(3).toInt)),
    // Corpus
    "chunk_by_tokens" -> r("idCol", "textCol", "chunkSize", "overlap")(
      (df, a) => Corpus.chunkByTokens(df, a(0), a(1), a(2).toInt,
        a(3).toInt)),
    "zipf_fit" -> r("srcCol", "textCol", "topN")(
      (df, a) => Corpus.zipfFit(df, a(0), a(1), a(2).toInt)),
    "source_kl_report" -> r("srcCol", "textCol")(
      (df, a) => Corpus.sourceKlReport(df, a(0), a(1))),
    "lexical_diversity" -> r("idCol", "textCol")(
      (df, a) => Corpus.lexicalDiversity(df, a(0), a(1))),
    "heaps_fit" -> r("groupCol", "textCol")(
      (df, a) => Corpus.heapsFit(df, a(0), a(1))),
    "dsir_weights" -> r("targetTable", "idCol", "textCol", "buckets")(
      (df, a) => Corpus.dsirWeights(df, tbl(df, a(0)), a(1), a(2),
        a(3).toInt)),
    // Multimodal (r14): content-addressed REAL pixel decode + perceptual
    // image near-dup pairing
    "pixel_stats" -> r("keyCol", "imagesTable")(
      (df, a) => Multimodal.pixelStatsReport(df, a(0), tbl(df, a(1)))),
    "image_dhash_pairs" -> r("nameCol", "binCol", "maxHamming")(
      (df, a) => Multimodal.imageDHashPairs(df, a(0), a(1), a(2).toInt)),
    // Media (r14): real JDK PCM decode + ISO-BMFF header walk
    "audio_stats" -> r("keyCol", "audioTable")(
      (df, a) => Media.audioStatsReport(df, a(0), tbl(df, a(1)))),
    "video_headers" -> r("keyCol", "videoTable")(
      (df, a) => Media.videoHeaderReport(df, a(0), tbl(df, a(1)))),
    // r15: stage-two video filter — per-track codec/dims/sample counts
    "video_tracks" -> r("keyCol", "videoTable")(
      (df, a) => Media.videoTrackReport(df, a(0), tbl(df, a(1)))),
    "image_near_dups" -> r("nameCol", "binCol", "maxHamming")(
      (df, a) => Multimodal.imageNearDups(df, a(0), a(1), a(2).toInt)),
    // Band-load pre-flight for the shared 16-bit-band Hamming engine
    // (r15): run this BEFORE hamming-banded near-dup passes on a new
    // corpus — it names the hot band/bucket a template mega-cluster
    // would make quadratic, with no join anywhere
    "hamming64_bucket_profile" -> r("idCol", "sigCol")(
      (df, a) => Dedup.hamming64BucketProfile(df, a(0), a(1))),
    "resize_stats" -> r("keyCol", "imagesTable", "outW", "outH")(
      (df, a) => Multimodal.pixelStatsReport(df, a(0), tbl(df, a(1)),
        resizeTo = Some((a(2).toInt, a(3).toInt))))
  )

  /** Dispatch by name with argument-count validation; the error message
    * is the documentation a SQL user sees. */
  def run(name: String, input: DataFrame, args: Seq[String]): DataFrame = {
    val rep = reports.getOrElse(name, throw new IllegalArgumentException(
      s"unknown graft report '$name'; known reports: " +
        reports.keys.toSeq.sorted.mkString(", ")))
    require(args.length == rep.argNames.length,
      s"graft_report('$name', table, ...) takes arguments " +
        s"(${rep.argNames.mkString(", ")}) — got ${args.length}, " +
        s"expected ${rep.argNames.length}")
    buildCounts.updateWith(name) { c => Some(c.getOrElse(0L) + 1L) }
    rep.build(input, args)
  }

  /** Times [[run]] actually BUILT a report, per name — the probe
    * GraftReportsSpec uses to assert an EXPLAIN + collect + re-collect
    * of an eager-training report trains exactly once. */
  private[graft] val buildCounts =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Memo for the TVF path: (name, args, canonicalized input plan) →
    * analyzed report plan. Access-ordered LRU bounded at 64 entries —
    * each value is a plan (plus, for eager reports, the trained model
    * folded into it as literals/LocalRelations), so the bound caps
    * driver memory, not correctness. */
  private val memo: java.util.Map[(String, Seq[String], LogicalPlan),
      LogicalPlan] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Seq[String], LogicalPlan),
          LogicalPlan](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Seq[String], LogicalPlan),
              LogicalPlan]): Boolean = size() > 64
      })

  /** Drop every memoized report plan (e.g. after in-place data changes
    * that bypass relation refresh). */
  def clearCache(): Unit = memo.clear()

  /** The TVF builder shared by [[GraftExtensions]] injection and runtime
    * [[register]]: evaluates the literal arguments, resolves the input
    * table against the active session, and returns the report's analyzed
    * plan — memoized so SQL re-analysis (EXPLAIN, view re-resolution)
    * does not re-run eager training jobs. */
  private[graft] def tvfBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length >= 2,
      "graft_report(name, table, args...) needs at least (name, table)")
    val args = es.map { e =>
      require(e.foldable,
        "graft_report arguments must be string literals")
      String.valueOf(e.eval(null))
    }
    val spark = SparkSession.active
    val input = spark.table(args(1))
    val key = (args.head, args.drop(2),
      input.queryExecution.analyzed.canonicalized)
    // get-then-put, NOT computeIfAbsent: a report whose second-table
    // argument is itself a view over graft_report re-enters this builder
    // during rep.build — computeIfAbsent would then mutate the
    // LinkedHashMap re-entrantly (the mutex is reentrant for the same
    // thread, the map's iteration state is not). The race this opens is
    // benign HERE: two concurrent first analyses of the same call may
    // both build (double training cost, accepted), and last-put-wins is
    // safe because every graft operator is DETERMINISTIC by design —
    // the whole DuckDB oracle gate depends on that — so both builds
    // embed the identical trained model.
    val cached = memo.get(key)
    if (cached != null) cached
    else {
      val built = run(args.head, input, args.drop(2))
        .queryExecution.analyzed
      memo.put(key, built)
      built
    }
  }

  /** Runtime registration for an existing session (the `Registry.ensure`
    * twin for table functions). Idempotent. */
  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.tableFunctionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_report")))
      reg.createOrReplaceTempFunction("graft_report", tvfBuilder _,
        "built-in")
  }
}
