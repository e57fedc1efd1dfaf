package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Spark-native extension point: injects the engine's Catalyst expressions
  * and aggregates into every session built with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), making them first-class SQL
  * functions cluster-wide — no per-session registration call needed.
  * Runtime registration for an existing session remains available via the
  * `register(spark)` companions. (The broadcast-carrying
  * NearestCentroid/TopCentroids expressions are excluded: their centroid
  * matrix is per-call state, not SQL-expressible.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      exprs => build(exprs))

  private def intOf(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_cosine", es => CosineSimilarity(es(0), es(1))))
    ext.injectFunction(fn("graft_dot", es => DotProduct(es(0), es(1))))
    ext.injectFunction(fn("graft_shingles", es => Shingles(es(0), intOf(es(1)))))
    ext.injectFunction(fn("graft_shingle_hashes", es => ShingleHashes(es(0), intOf(es(1)))))
    ext.injectFunction(fn("graft_shingle_hashes64", es => ShingleHashes64(es(0), intOf(es(1)))))
    ext.injectFunction(fn("graft_minhash_sig",
      es => MinHashSig(es(0), intOf(es(1)), intOf(es(2)))))
    ext.injectFunction(fn("graft_simhash", es => SimHashSig(es(0))))
    ext.injectFunction(fn("graft_simhash64", es => SimHashSig64(es(0))))
    ext.injectFunction(fn("graft_normalize_text", es => NormalizeText(es(0))))
    ext.injectFunction(fn("graft_jaro_winkler", es => JaroWinklerSim(es(0), es(1))))
    ext.injectFunction(fn("graft_damerau_levenshtein",
      es => DamerauLevenshteinDist(es(0), es(1))))
    ext.injectFunction(fn("graft_topk_agg",
      es => TopKAgg(es(0), intOf(es(1))).toAggregateExpression()))
    ext.injectFunction(fn("graft_minhash_agg",
      es => MinHashAgg(es(0), intOf(es(1))).toAggregateExpression()))
    // the TABLE-function facade: DataFrame-shaped reports reachable as
    // SELECT * FROM graft_report('<name>', '<table>', args...) — the
    // registry lives in GraftReports
    ext.injectTableFunction((FunctionIdentifier("graft_report"),
      new ExpressionInfo("graft", "graft_report"),
      (es: Seq[Expression]) => GraftReports.tvfBuilder(es)))
    ext.injectOptimizerRule(_ => graft.plans.JaroWinklerLengthPruning)
  }
}
